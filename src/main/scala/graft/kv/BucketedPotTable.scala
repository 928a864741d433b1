package graft.kv

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed pot: the 100 TB evolution of [[PotTable]].
  *
  * The reference rewrites the ENTIRE path object on every document write
  * (server.go:396-400) — write amplification proportional to table size. This
  * variant hash-buckets rows by key into `nBuckets` bucket files and rewrites
  * ONLY the buckets containing updated keys: an upsert of k keys touches at
  * most k buckets regardless of table size.
  *
  * Commit protocol (stage-then-publish, same CAS as PotTable):
  *   - each touched bucket's new content is staged at a writer-unique dir
  *     `data/b<i>_g<N>_<uuid>/`;
  *   - the commit marker `_commits/<N>` (atomic create-new == pot's
  *     `.potlock` DoesNotExist precondition) contains the manifest
  *     `bucket:stagedPath` per line;
  *   - readers resolve bucket i at generation G by overlaying manifests
  *     1..G in order — the latest entry per bucket wins. Marker exists =>
  *     its staged dirs are complete; a losing writer deletes only its own
  *     staging and can never clobber published data.
  *
  * `compact()` rewrites every live bucket at one generation (the
  * Spark-for-compaction role the north star assigns); `vacuum()` deletes
  * staged dirs that no current manifest references, with a generation-grace
  * window so concurrent readers that pinned an older generation keep their
  * files.
  */
final class BucketedPotTable(
    spark: SparkSession, root: String, path: String, nBuckets: Int) {
  import spark.implicits._
  import PotTable.CommitConflict

  private def dir = s"$root/$path"
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketCol = pmod(xxhash64($"key"), lit(nBuckets.toLong)).cast("int")

  def generation: Long = {
    val commits = new Path(s"$dir/_commits")
    if (!fs.exists(commits)) 0L
    else fs.listStatus(commits).map(_.getPath.getName.toLong)
      .foldLeft(0L)(math.max)
  }

  private def markerPath(gen: Long) = new Path(s"$dir/_commits/$gen")

  private def readManifest(gen: Long): Map[Int, String] = {
    val in = fs.open(markerPath(gen))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val i = line.indexOf(':')
      line.take(i).toInt -> line.drop(i + 1)
    }.toMap
  }

  /** bucket -> staged path as of `gen` (manifest overlay, oldest first). */
  private def resolve(gen: Long): Map[Int, String] =
    (1L to gen).foldLeft(Map.empty[Int, String]) { (acc, g) =>
      if (fs.exists(markerPath(g))) acc ++ readManifest(g) else acc
    }

  /** Full snapshot read at the current generation. At scale each bucket is a
    * separately-pruned directory; the union is read-parallel and never
    * widens a shuffle.
    */
  def get(): DataFrame = {
    val m = resolve(generation)
    if (m.isEmpty) spark.emptyDataFrame
    else m.values.toSeq.sorted.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  private def readBucket(m: Map[Int, String], b: Int): Option[DataFrame] =
    m.get(b).map(spark.read.parquet(_))

  /** Stage per-bucket data, then CAS-publish the manifest as `expected`+1. */
  private def commitBuckets(
      staged: Map[Int, String], expectedGen: Long): Long = {
    val next = expectedGen + 1
    fs.mkdirs(markerPath(next).getParent)
    try {
      val out = fs.create(markerPath(next), false) // atomic create-new == CAS
      val body = staged.toSeq.sortBy(_._1)
        .map { case (b, p) => s"$b:$p" }.mkString("\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.close()
      next
    } catch {
      case _: java.io.IOException =>
        staged.values.foreach(p => fs.delete(new Path(p), true)) // own staging only
        throw new CommitConflict(
          s"pot $path: generation $next already committed by another writer")
    }
  }

  private def stagePath(b: Int, gen: Long): String =
    s"$dir/data/b${b}_g${gen}_${java.util.UUID.randomUUID()}"

  /** Partition-scoped upsert: last-writer-wins merge, but ONLY the buckets
    * containing incoming keys are staged and republished. Returns the new
    * generation (unchanged generation for an empty batch).
    */
  def upsert(docs: DataFrame): Long = {
    val gen = generation
    val next = gen + 1
    val current = resolve(gen)
    val stamped = docs
      .withColumn("_modified", current_timestamp())
      .withColumn("_b", bucketCol)
    val touched = stamped.select($"_b").distinct().as[Int].collect().sorted
    if (touched.isEmpty) return gen // empty batch: no-op, don't burn a generation
    val w = Window.partitionBy($"key").orderBy($"_src".desc)
    val staged = touched.map { b =>
      val incoming = stamped.filter($"_b" === b).drop("_b").withColumn("_src", lit(1))
      val merged = readBucket(current, b) match {
        case None => incoming.drop("_src")
        case Some(old) =>
          incoming.unionByName(old.withColumn("_src", lit(0)))
            .withColumn("_rn", row_number().over(w))
            .filter($"_rn" === 1)
            .drop("_rn", "_src")
      }
      val p = stagePath(b, next)
      merged.write.mode("errorifexists").parquet(p)
      b -> p
    }.toMap
    commitBuckets(staged, gen)
  }

  /** Multi-key delete — again only touched, existing buckets restage. */
  def remove(keys: Seq[String]): Long = {
    val gen = generation
    if (gen == 0L) return 0L
    val next = gen + 1
    val current = resolve(gen)
    val keysDf = keys.toDF("key").withColumn("_b", bucketCol)
    val touched = keysDf.select($"_b").distinct().as[Int].collect().sorted
      .filter(current.contains)
    if (touched.isEmpty) return gen // nothing to delete: no-op
    val staged = touched.map { b =>
      val p = stagePath(b, next)
      readBucket(current, b).get
        .join(broadcast(keysDf.filter($"_b" === b).select($"key")),
          Seq("key"), "left_anti")
        .write.mode("errorifexists").parquet(p)
      b -> p
    }.toMap
    commitBuckets(staged, gen)
  }

  /** Compaction: restage every live bucket at one generation, collapsing the
    * manifest overlay a reader must walk. Old staged dirs stay on disk until
    * [[vacuum]] — concurrent readers keep their pinned files.
    */
  def compact(): Long = {
    val gen = generation
    if (gen == 0L) return 0L
    val next = gen + 1
    val current = resolve(gen)
    val staged = current.keys.toSeq.sorted.map { b =>
      val p = stagePath(b, next)
      readBucket(current, b).get.coalesce(1)
        .write.mode("errorifexists").parquet(p)
      b -> p
    }.toMap
    commitBuckets(staged, gen)
  }

  /** Delete staged dirs unreferenced by the manifests of the last
    * `retainGenerations` generations' views (lost races and superseded
    * buckets older than the grace window).
    */
  def vacuum(retainGenerations: Int = 1): Unit = {
    val gen = generation
    val dataRoot = new Path(s"$dir/data")
    if (!fs.exists(dataRoot)) return
    val keep = (math.max(0L, gen - retainGenerations) to gen)
      .flatMap(g => resolve(g).values)
      .map(p => new Path(p).getName).toSet
    fs.listStatus(dataRoot).foreach { st =>
      if (!keep.contains(st.getPath.getName)) fs.delete(st.getPath, true)
    }
  }

  /** Buckets republished by generation `gen`'s commit — test hook for
    * asserting partition-scoped (not whole-table) rewrite.
    */
  def bucketsWrittenAt(gen: Long): Seq[Int] =
    if (fs.exists(markerPath(gen))) readManifest(gen).keys.toSeq.sorted
    else Seq.empty
}

object BucketedPotTable {
  def apply(spark: SparkSession, root: String, path: String,
      nBuckets: Int = 16): BucketedPotTable =
    new BucketedPotTable(spark, root, path, nBuckets)
}
