package graft.kv

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed pot: the 100 TB evolution of [[PotTable]].
  *
  * The reference rewrites the ENTIRE path object on every document write
  * (server.go:396-400) — write amplification proportional to table size. This
  * variant hash-buckets rows by key into `nBuckets` bucket files and rewrites
  * ONLY the buckets containing updated keys: write amplification drops from
  * O(table) to O(table / nBuckets x touched-buckets), and an upsert of k keys
  * touches at most k buckets regardless of table size.
  *
  * Layout (all under `<root>/<path>/`):
  *   - `b<i>/v=<N>/` parquet dir = bucket i as of generation N (only present
  *     for generations that rewrote bucket i);
  *   - `_commits/<N>` atomic CAS marker (same protocol as PotTable — create
  *     with overwrite=false == pot's `.potlock` DoesNotExist precondition);
  *   - a reader resolves bucket i at generation G to its LATEST v <= G —
  *     a manifest-free design where the filesystem listing IS the manifest,
  *     correct because markers commit monotonically.
  *
  * `compact()` rewrites every live bucket at the current generation in one
  * commit — the Spark-for-compaction role the north star assigns.
  */
final class BucketedPotTable(
    spark: SparkSession, root: String, path: String, nBuckets: Int) {
  import spark.implicits._

  private def dir = s"$root/$path"
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketCol = pmod(xxhash64($"key"), lit(nBuckets.toLong)).cast("int")

  def generation: Long = {
    val commits = new Path(s"$dir/_commits")
    if (!fs.exists(commits)) 0L
    else fs.listStatus(commits).map(_.getPath.getName.toLong).foldLeft(0L)(math.max)
  }

  /** Latest committed version of bucket `b` at or below generation `gen`,
    * or None if the bucket has never been written.
    */
  private def bucketVersion(b: Int, gen: Long): Option[Long] = {
    val bdir = new Path(s"$dir/b$b")
    if (!fs.exists(bdir)) None
    else fs.listStatus(bdir)
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ <= gen)
      .reduceOption((a: Long, b: Long) => math.max(a, b))
  }

  /** Read one bucket as of `gen` (empty if never written). */
  private def readBucket(b: Int, gen: Long): Option[DataFrame] =
    bucketVersion(b, gen).map(v => spark.read.parquet(s"$dir/b$b/v=$v"))

  /** Full snapshot read at the current generation: union of per-bucket
    * latest versions. At scale each bucket is a partition-pruned directory;
    * the union is read-parallel and never widens a shuffle.
    */
  def get(): DataFrame = {
    val gen = generation
    val parts = (0 until nBuckets).flatMap(b => readBucket(b, gen))
    if (parts.isEmpty) spark.emptyDataFrame
    else parts.reduce(_ unionByName _)
  }

  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private def commitMarker(next: Long): Unit = {
    val marker = new Path(s"$dir/_commits/$next")
    fs.mkdirs(marker.getParent)
    try { fs.create(marker, false).close() }
    catch {
      case _: java.io.IOException =>
        throw new CommitConflict(
          s"pot $path: generation $next already committed by another writer")
    }
  }

  /** Partition-scoped upsert: last-writer-wins merge, but ONLY the buckets
    * containing incoming keys are rewritten. Returns the new generation.
    */
  def upsert(docs: DataFrame): Long = {
    val gen = generation
    val next = gen + 1
    val stamped = docs
      .withColumn("_modified", current_timestamp())
      .withColumn("_b", bucketCol)
    // which buckets does this batch touch?
    val touched = stamped.select($"_b").distinct().as[Int].collect().sorted
    if (touched.isEmpty) return gen // empty batch: no-op, don't burn a generation
    val w = Window.partitionBy($"key").orderBy($"_src".desc)
    touched.foreach { b =>
      val incoming = stamped.filter($"_b" === b).drop("_b").withColumn("_src", lit(1))
      val merged = readBucket(b, gen) match {
        case None => incoming.drop("_src")
        case Some(old) =>
          incoming.unionByName(old.withColumn("_src", lit(0)))
            .withColumn("_rn", row_number().over(w))
            .filter($"_rn" === 1)
            .drop("_rn", "_src")
      }
      merged.write.mode("overwrite").parquet(s"$dir/b$b/v=$next")
    }
    commitMarker(next)
    next
  }

  /** Multi-key delete — again only touched buckets rewrite. */
  def remove(keys: Seq[String]): Long = {
    val gen = generation
    if (gen == 0L) return 0L
    val next = gen + 1
    val keysDf = keys.toDF("key").withColumn("_b", bucketCol)
    val touched = keysDf.select($"_b").distinct().as[Int].collect().sorted
      .filter(b => bucketVersion(b, gen).isDefined)
    touched.foreach { b =>
      val old = readBucket(b, gen).get
      old.join(broadcast(keysDf.filter($"_b" === b).select($"key")),
          Seq("key"), "left_anti")
        .write.mode("overwrite").parquet(s"$dir/b$b/v=$next")
    }
    commitMarker(next)
    next
  }

  /** Compaction: rewrite every live bucket at one generation, collapsing the
    * version history a reader must list. Run periodically (Spark bulk job).
    */
  def compact(): Long = {
    val gen = generation
    if (gen == 0L) return 0L
    val next = gen + 1
    (0 until nBuckets).foreach { b =>
      readBucket(b, gen).foreach { df =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$dir/b$b/v=$next")
      }
    }
    commitMarker(next)
    // drop superseded bucket versions (safe: readers of gen <= next resolve
    // to v=next after this point; time-travel readers would keep them)
    (0 until nBuckets).foreach { b =>
      val bdir = new Path(s"$dir/b$b")
      if (fs.exists(bdir)) {
        fs.listStatus(bdir)
          .filter(_.getPath.getName.stripPrefix("v=").toLong < next)
          .foreach(st => fs.delete(st.getPath, true))
      }
    }
    next
  }

  /** Bucket files whose latest version is exactly `gen` — test hook for
    * asserting partition-scoped (not whole-table) rewrite.
    */
  def bucketsWrittenAt(gen: Long): Seq[Int] =
    (0 until nBuckets).filter { b =>
      val bdir = new Path(s"$dir/b$b")
      fs.exists(bdir) && fs.listStatus(bdir)
        .exists(_.getPath.getName == s"v=$gen")
    }
}

object BucketedPotTable {
  def apply(spark: SparkSession, root: String, path: String,
      nBuckets: Int = 16): BucketedPotTable =
    new BucketedPotTable(spark, root, path, nBuckets)
}
