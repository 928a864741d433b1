package graft.kv

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed pot: the 100 TB evolution of [[PotTable]].
  *
  * The reference rewrites the ENTIRE path object on every document write
  * (server.go:396-400) — write amplification proportional to table size. This
  * variant hash-buckets rows by key into `nBuckets` buckets and rewrites
  * ONLY the buckets containing updated keys: an upsert of k keys touches at
  * most k buckets regardless of table size.
  *
  * Commit protocol (stage-then-publish, same CAS as PotTable — the
  * marker mechanics, husk recovery included, live in [[CommitMarker]]):
  *   - ONE Spark job stages every touched bucket's new content under a
  *     writer-unique root `data/g<N>_<uuid>/` via a `partitionBy("_b")`
  *     write (one `_b=<i>/` child per touched bucket) — a batch touching
  *     all buckets of a large table still costs one job launch, not
  *     |buckets| serial jobs;
  *   - the commit marker `_commits/<N>` contains the manifest
  *     `bucket:stagedPath` per line; a bucket emptied by a remove gets a
  *     TOMBSTONE line `bucket:` so the overlay drops it;
  *   - readers resolve bucket i at generation G by overlaying manifests
  *     1..G in order — the latest entry per bucket wins. Marker committed
  *     (non-empty) => its staged dirs are complete; a losing writer deletes
  *     only its own staging and can never clobber published data.
  *
  * `compact()` rewrites every live bucket at one generation (the
  * Spark-for-compaction role the north star assigns); `vacuum()` deletes
  * staged roots that no retained manifest references, skipping roots whose
  * encoded generation is ahead of the committed one (a concurrent writer's
  * in-flight staging — deleting those would publish dangling pointers).
  */
final class BucketedPotTable(
    spark: SparkSession, root: String, path: String, nBuckets: Int) {
  import spark.implicits._
  import PotTable.CommitConflict

  private def dir = s"$root/$path"
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's ROUTING MODULUS — self-describing since r15: the stamped
    * `_meta/buckets` marker is authoritative, the constructor count
    * (<= 0 = unspecified) is validated against it on first use and a
    * mismatch fails loudly instead of silently mis-routing point reads
    * and writes. See [[BucketMeta]].
    */
  private lazy val buckets: Int = BucketMeta.resolve(
    fs, new Path(dir), Some(nBuckets).filter(_ > 0),
    storeLive = fs.exists(new Path(s"$dir/_commits")))

  /** Stamp the modulus before any mutation routes rows by it (idempotent;
    * a CAS race between same-count creators is adoption).
    */
  private def stampMeta(): Unit =
    BucketMeta.stamp(fs, new Path(dir), buckets)

  private def bucketCol = pmod(xxhash64($"key"), lit(buckets.toLong)).cast("int")

  def generation: Long =
    CommitMarker.committedGenerations(fs, new Path(s"$dir/_commits"))
      .foldLeft(0L)(math.max)

  private def markerPath(gen: Long) = new Path(s"$dir/_commits/$gen")

  private def isCommitted(gen: Long): Boolean =
    fs.exists(markerPath(gen)) && fs.getFileStatus(markerPath(gen)).getLen > 0

  /** Manifest lines `bucket:stagedPath`; an empty path is a tombstone. */
  private def readManifest(gen: Long): Map[Int, String] =
    CommitMarker.read(fs, markerPath(gen))
      .split("\n").filter(_.nonEmpty).map { line =>
        val i = line.indexOf(':')
        line.take(i).toInt -> line.drop(i + 1)
      }.toMap

  /** bucket -> staged path as of `gen` (manifest overlay, oldest first;
    * tombstoned buckets dropped after the overlay so a later tombstone
    * shadows an earlier write).
    */
  private def resolve(gen: Long): Map[Int, String] =
    (1L to gen).foldLeft(Map.empty[Int, String]) { (acc, g) =>
      if (isCommitted(g)) acc ++ readManifest(g) else acc
    }.filter(_._2.nonEmpty)

  /** Full snapshot read at the current generation: one multi-path parquet
    * scan over every live bucket dir — read-parallel, no union overhead.
    */
  def get(): DataFrame = {
    val m = resolve(generation)
    if (m.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.values.toSeq.sorted: _*)
  }

  /** TIME TRAVEL read (r14): the table's state at manifest generation
    * `gen` — the manifest overlay stops at `gen`, so the scan opens
    * exactly the staged dirs that generation's readers saw. Valid while
    * [[vacuum]] retention covers `gen` (vacuumed staged dirs fail the
    * scan loudly — the same retention contract as PotTable.getAt). An
    * uncommitted/out-of-range generation fails loudly, never a stale
    * fallback.
    */
  def getAt(gen: Long): DataFrame = {
    require(gen >= 1L && gen <= generation && isCommitted(gen),
      s"bucketed pot $path: generation $gen is not committed " +
        s"(head is $generation) — never a stale/empty fallback")
    val m = resolve(gen)
    if (m.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.values.toSeq.sorted: _*)
  }

  /** Point read: resolve `key`'s bucket driver-side (same xxhash64/pmod
    * as [[bucketCol]], evaluated without a job) and scan ONLY that
    * bucket's current staged dir — the read-side payoff of bucketing.
    * The reference serves a get by reading the whole path object
    * (server.go:210-239); here a point lookup opens one bucket's files
    * regardless of table size. An absent bucket yields an empty frame
    * with the table's schema.
    */
  def get(key: String): DataFrame = {
    import spark.implicits.StringToColumn
    val m = resolve(generation)
    if (m.isEmpty) return spark.emptyDataFrame
    m.get(bucketOf(key)) match {
      case Some(dir) =>
        spark.read.parquet(dir).filter($"key" === key)
      case None =>
        spark.read.parquet(m.values.toSeq.sorted: _*)
          .filter(org.apache.spark.sql.functions.lit(false))
    }
  }

  /** Driver-side twin of [[bucketCol]]: xxhash64 (seed 42, Spark's
    * default) pmod nBuckets on the UTF-8 key bytes.
    */
  private def bucketOf(key: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = new XxHash64(Seq(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(key),
      org.apache.spark.sql.types.StringType))).eval(null).asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  private def stageRoot(gen: Long): String =
    s"$dir/data/g${gen}_${java.util.UUID.randomUUID()}"

  /** Publish `stagedRoot`'s `_b=<i>` children as generation `expected`+1:
    * manifest entries for every touched bucket, tombstones for touched
    * buckets the staging job emptied (partitionBy writes no dir for them).
    */
  private def commitStaged(
      stagedRoot: String, touched: Seq[Int], expectedGen: Long): Long = {
    val next = expectedGen + 1
    val written = fs.listStatus(new Path(stagedRoot)).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_b="))
      .map(_.stripPrefix("_b=").toInt).toSet
    val body = touched.sorted
      .map(b => if (written(b)) s"$b:$stagedRoot/_b=$b" else s"$b:")
      .mkString("\n")
    fs.mkdirs(markerPath(next).getParent)
    // A12: time the publish CAS like PotTable.commit (lock-hold analogue)
    val t0 = System.nanoTime()
    try {
      CommitMarker.publish(fs, markerPath(next), body)
      next
    } catch {
      case e: CommitConflict =>
        fs.delete(new Path(stagedRoot), true) // own staging only
        throw e
    } finally graft.Metrics.of(spark)
      .foreach(_.recordLockMs((System.nanoTime() - t0) / 1000000L))
  }

  /** Read the current content of `buckets`, `_b` recomputed from the key
    * (deterministic), as one multi-path scan.
    */
  private def readBuckets(current: Map[Int, String], buckets: Seq[Int]): DataFrame =
    spark.read.parquet(buckets.flatMap(current.get): _*)
      .withColumn("_b", bucketCol)

  /** Partition-scoped upsert: last-writer-wins merge, but ONLY the buckets
    * containing incoming keys are staged (one job) and republished. Returns
    * the new generation (unchanged generation for an empty batch).
    */
  def upsert(docs: DataFrame): Long = {
    stampMeta()
    val gen = generation
    val current = resolve(gen)
    val stamped = docs
      .withColumn("_modified", current_timestamp())
      .withColumn("_b", bucketCol)
    // bucket IDs only — bounded by nBuckets, not by data size
    val touched = stamped.select($"_b").distinct().as[Int].collect().sorted.toSeq
    if (touched.isEmpty) return gen // empty batch: no-op, don't burn a generation
    val incoming = stamped.withColumn("_src", lit(1))
    val existing = touched.filter(current.contains)
    val merged =
      if (existing.isEmpty) incoming.drop("_src")
      else {
        val old = readBuckets(current, existing).withColumn("_src", lit(0))
        val w = Window.partitionBy($"key").orderBy($"_src".desc)
        incoming.unionByName(old)
          .withColumn("_rn", row_number().over(w))
          .filter($"_rn" === 1)
          .drop("_rn", "_src")
      }
    val staged = stageRoot(gen + 1)
    merged.repartition(touched.length, $"_b")
      .write.partitionBy("_b").mode("errorifexists").parquet(staged)
    commitStaged(staged, touched, gen)
  }

  /** Multi-key delete — again only touched, existing buckets restage (one
    * job); a bucket whose last row is deleted becomes a manifest tombstone.
    */
  def remove(keys: Seq[String]): Long = {
    graft.Metrics.of(spark).foreach(_.recordRemove()) // A12 op counter
    stampMeta()
    val gen = generation
    if (gen == 0L) return 0L
    val current = resolve(gen)
    val keysDf = keys.toDF("key").withColumn("_b", bucketCol)
    val touched = keysDf.select($"_b").distinct().as[Int].collect().sorted
      .filter(current.contains).toSeq
    if (touched.isEmpty) return gen // nothing to delete: no-op
    val remaining = readBuckets(current, touched)
      .join(broadcast(keysDf.select($"key")), Seq("key"), "left_anti")
    val staged = stageRoot(gen + 1)
    remaining.repartition(touched.length, $"_b")
      .write.partitionBy("_b").mode("errorifexists").parquet(staged)
    commitStaged(staged, touched, gen)
  }

  /** Predicate remove (r14): delete every document matching `pred`,
    * restaging ONLY the buckets that contain matching rows — the
    * driver never materializes a key list (the one bounded collect is
    * bucket IDs, <= nBuckets). The distributed twin of [[remove]] for
    * data-sized delete sets (TTL sweeps, retention): cost scales with
    * the touched buckets, not the expired-key count.
    */
  def removeWhere(pred: org.apache.spark.sql.Column): Long = {
    graft.Metrics.of(spark).foreach(_.recordRemove())
    stampMeta()
    val gen = generation
    if (gen == 0L) return 0L
    val current = resolve(gen)
    if (current.isEmpty) return gen
    val touched = spark.read.parquet(current.values.toSeq.sorted: _*)
      .filter(pred).withColumn("_b", bucketCol)
      .select($"_b").distinct().as[Int].collect().sorted.toSeq
    if (touched.isEmpty) return gen // nothing matches: no-op
    // Keep rows where pred is NOT TRUE (coalesce NULL -> false): survival is
    // then independent of bucket co-residency — a NULL-pred row in a touched
    // bucket survives the restage, matching the filter(pred) touch detection
    // (NULL = not matching) and SQL DELETE semantics.
    val remaining = readBuckets(current, touched).filter(!coalesce(pred, lit(false)))
    val staged = stageRoot(gen + 1)
    remaining.repartition(touched.length, $"_b")
      .write.partitionBy("_b").mode("errorifexists").parquet(staged)
    commitStaged(staged, touched, gen)
  }

  /** Compaction: restage every live bucket at one generation (one job),
    * collapsing the manifest overlay a reader must walk. Old staged dirs
    * stay on disk until [[vacuum]] — concurrent readers keep their pinned
    * files.
    */
  def compact(): Long = {
    stampMeta()
    val gen = generation
    if (gen == 0L) return 0L
    val current = resolve(gen)
    if (current.isEmpty) return gen // fully-emptied table: nothing to compact
    val live = current.keys.toSeq.sorted
    val staged = stageRoot(gen + 1)
    readBuckets(current, live)
      .repartition(live.length, $"_b")
      .write.partitionBy("_b").mode("errorifexists").parquet(staged)
    commitStaged(staged, live, gen)
  }

  /** Delete staged roots unreferenced by the manifests of the last
    * `retainGenerations` generations' views (lost races and superseded
    * buckets older than the grace window). Roots whose encoded generation
    * is ahead of the committed one are a concurrent writer's in-flight
    * staging and are always kept — see the class note.
    */
  def vacuum(retainGenerations: Int = 1): Unit = {
    val gen = generation
    val dataRoot = new Path(s"$dir/data")
    if (!fs.exists(dataRoot)) return
    // a manifest value is `<root>/_b=<i>`; keep the top dir under data/
    def topSegment(p: String): String = {
      val hp = new Path(p)
      if (hp.getName.startsWith("_b=")) hp.getParent.getName else hp.getName
    }
    val keep = (math.max(0L, gen - retainGenerations) to gen)
      .flatMap(g => resolve(g).values)
      .map(topSegment).toSet
    val StagedGen = "^g(\\d+)_.*".r
    fs.listStatus(dataRoot).foreach { st =>
      val name = st.getPath.getName
      val inFlight = name match {
        case StagedGen(g) => g.toLong > gen
        case _            => false
      }
      if (!inFlight && !keep.contains(name)) fs.delete(st.getPath, true)
    }
  }

  /** Admin recovery for a wedged generation — see [[PotTable.repair]]. */
  def repair(): Seq[Long] =
    CommitMarker.repair(fs, new Path(s"$dir/_commits"))

  // ===================== persisted z-order layout (r16) ==================
  // q84 proved the z-order mechanism on a per-query temp dir; this is the
  // STORE-NATIVE form the r15 verdict asked for: a maintenance op that
  // rewrites the table's current state z-clustered under `_zorder/` and
  // publishes it as a CommitMarker generation readers ADOPT across
  // queries (and processes) — what a 100 TB lookup table actually runs.
  // The layout is a derived artifact pinned to its SOURCE generation: a
  // reader meeting a layout built from an older store generation fails
  // loudly (stale layout, re-run cluster) instead of serving dropped-
  // behind data. N-dim interleave via ZOrderLayout.zvalN; the caller
  // maps its dimensions into the [0, 2^8) domain and NAMES them — the
  // names persist in the layout parquet (filterable) and in the marker
  // body (self-describing, like _meta/buckets).

  private def zorderCommits = new Path(s"$dir/_zorder/_commits")

  /** Rewrite the current state z-clustered on `dims` (name -> column in
    * the [0,256) domain) and publish the layout. One shuffle, one file
    * per occupied z-bucket; the marker body records dims, bucketBits and
    * the source generation. Returns the layout generation.
    */
  def cluster(dims: Seq[(String, org.apache.spark.sql.Column)],
      bucketBits: Int = 6): Long = {
    require(dims.length >= 2, "cluster needs at least two dimensions")
    val srcGen = generation
    require(srcGen >= 1L, s"bucketed pot $path: nothing to cluster")
    val layoutGen = CommitMarker
      .committedGenerations(fs, zorderCommits).foldLeft(0L)(math.max) + 1
    val staged =
      s"$dir/_zorder/data/g${layoutGen}_${java.util.UUID.randomUUID()}"
    val named = dims.foldLeft(get()) { case (df, (n, c)) =>
      df.withColumn(n, c.cast("long"))
    }
    graft.Tables.spread(
        named.withColumn("zb", shiftright(
          graft.operators.ZOrderLayout.zvalN(dims.map(d => col(d._1))),
          dims.length * graft.operators.ZOrderLayout.Bits - bucketBits)
          .cast("long")),
        col("zb"))
      .write.partitionBy("zb").mode("errorifexists").parquet(staged)
    val body = s"$staged\n" +
      s"""{"srcGen":$srcGen,"bucketBits":$bucketBits,""" +
      s""""dims":[${dims.map(d => "\"" + d._1 + "\"").mkString(",")}]}"""
    fs.mkdirs(zorderCommits)
    try CommitMarker.publish(
      fs, new Path(zorderCommits, layoutGen.toString), body)
    catch {
      case e: CommitConflict =>
        fs.delete(new Path(staged), true) // own staging only
        throw e
    }
    layoutGen
  }

  /** The latest published layout: (dataDir, srcGen, bucketBits, dims). */
  private def resolveLayout(): Option[(String, Long, Int, Seq[String])] = {
    val gens = CommitMarker.committedGenerations(fs, zorderCommits)
    if (gens.isEmpty) return None
    val body = CommitMarker.read(fs, new Path(zorderCommits, gens.max.toString))
    val lines = body.split("\n", 2)
    val j = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lines(1))
    import scala.jdk.CollectionConverters._
    Some((lines(0), j.get("srcGen").asLong(), j.get("bucketBits").asInt(),
      j.get("dims").elements().asScala.map(_.asText()).toSeq))
  }

  /** True iff a layout exists AND matches the store's current
    * generation — the "do I need to re-cluster?" probe. */
  def layoutFresh(): Boolean =
    resolveLayout().exists(_._2 == generation)

  /** Delete layout data dirs not referenced by the newest `retain`
    * layout generations ([[vacuum]]'s discipline applied to the derived
    * artifact — without it every re-cluster leaks a full table copy).
    * Staged dirs whose encoded generation is ahead of the committed head
    * are a concurrent clusterer's in-flight staging and are always kept.
    */
  def vacuumLayouts(retain: Int = 1): Seq[String] = {
    val dataRoot = new Path(s"$dir/_zorder/data")
    if (!fs.exists(dataRoot)) return Seq.empty
    val gens = CommitMarker.committedGenerations(fs, zorderCommits)
    val head = gens.foldLeft(0L)(math.max)
    val keep = gens.sorted.reverse.take(math.max(retain, 1)).map { g =>
      val body = CommitMarker.read(fs, new Path(zorderCommits, g.toString))
      new Path(body.split("\n", 2)(0)).getName
    }.toSet
    val StagedGen = "^g(\\d+)_.*".r
    fs.listStatus(dataRoot).toSeq.flatMap { st =>
      val name = st.getPath.getName
      val inFlight = name match {
        case StagedGen(g) => g.toLong > head
        case _            => false
      }
      // report a path as retired ONLY when the delete actually happened —
      // a false return (permissions, concurrent access) must not read as
      // a reclaimed layout in the vacuum_layouts CALL output (r18 ADVICE)
      if (!inFlight && !keep.contains(name) && fs.delete(st.getPath, true))
        Some(st.getPath.toString)
      else None
    }
  }

  /** Pruned read over the PERSISTED layout for a range predicate on one
    * clustered dimension: the structurally-derived bucket set becomes a
    * literal `zb IN (...)` partition filter (pruned at file listing);
    * the exact range predicate applies on top. Fails loudly on a stale
    * layout (source generation moved) or an un-clustered dimension —
    * never silently serves dropped-behind data or an unpruned scan.
    */
  def readClustered(dim: String, lo: Int, hi: Int): DataFrame = {
    val (dataDir, srcGen, bucketBits, dims) = resolveLayout().getOrElse(
      throw new IllegalStateException(
        s"bucketed pot $path: no z-order layout published — run cluster()"))
    require(srcGen == generation,
      s"bucketed pot $path: z-order layout was built at generation " +
        s"$srcGen but the store is at $generation — stale layout; " +
        "re-run cluster() (a layout is a derived artifact, it never " +
        "silently serves old state)")
    val di = dims.indexOf(dim)
    require(di >= 0, s"bucketed pot $path: dimension '$dim' is not in " +
      s"the clustered set ${dims.mkString("[", ", ", "]")}")
    val zbs = graft.operators.ZOrderLayout
      .bucketsForRangeN(di, dims.length, lo, hi, bucketBits)
    spark.read.parquet(dataDir)
      .filter(col("zb").isin(zbs: _*))
      .filter(col(dim).between(lo.toLong, hi.toLong))
  }

  /** Buckets republished (or tombstoned) by generation `gen`'s commit —
    * test hook for asserting partition-scoped (not whole-table) rewrite.
    */
  def bucketsWrittenAt(gen: Long): Seq[Int] =
    if (isCommitted(gen)) readManifest(gen).keys.toSeq.sorted
    else Seq.empty

  /** Online reshard: rewrite the table's current state into a NEW bucketed
    * table (same root, `path` = this table's path + the suffix) with a
    * different bucket count. The bucket function (hash(key) mod n) is baked
    * into every manifest, so a bucket-count change is necessarily a full
    * rewrite — the point of doing it THROUGH Spark is that it is ONE
    * distributed job (read overlay → shuffle by new bucket → stage →
    * single CAS commit) while this table keeps serving reads untouched;
    * cutover is the caller swapping its path pointer, and abandoning the
    * new path aborts the reshard with no effect on the old. The new
    * table's generation history starts at 1 (a reshard is a state copy,
    * not a history copy — time travel stays with the old path, exactly
    * like [[PotTable.restore]]'s snapshot semantics).
    */
  def reshardTo(newBuckets: Int, suffix: String = "_resharded"): BucketedPotTable = {
    require(newBuckets >= 1, "reshardTo needs an explicit positive bucket count")
    val out = new BucketedPotTable(spark, root, s"$path$suffix", newBuckets)
    out.upsert(get())
    out
  }
}

object BucketedPotTable {
  /** `nBuckets = 0` (the default) = self-describing open: the stamped
    * `_meta/buckets` modulus is used ([[BucketMeta.DefaultBuckets]] for a
    * brand-new store). A positive count on an existing store must match
    * the stamped value — mismatch fails loudly.
    */
  def apply(spark: SparkSession, root: String, path: String,
      nBuckets: Int = 0): BucketedPotTable =
    new BucketedPotTable(spark, root, path, nBuckets)
}
