package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: the embeddings corpus written ONCE with a coarse
  * search key as a parquet PARTITION column, so a similarity lookup prunes
  * at the file-listing level (PartitionFilters in the scan — files outside
  * the probed buckets are never opened). Two index families:
  *
  *   - sign-LSH ([[locate]]): random-hyperplane signature buckets (s2
  *     single-bucket, s3 multi-probe);
  *   - IVF ([[locateIvf]]): nearest-centroid cells (s4, top-2-cell probes).
  *
  * Layout notes:
  *   - partition values carry a letter prefix (`s<bits>` / `c<cid>`): a raw
  *     digit string would be type-inferred by partition discovery,
  *     corrupting both pruning and emitted values;
  *   - the true `sig` string stays a DATA column so query output is
  *     byte-identical to the unindexed form (same oracle);
  *   - indexes are content-addressed by source dir under java.io.tmpdir
  *     and built at most once. Publication protocol: one builder wins an
  *     atomic create-new `.claim` file (cross-process safe), builds into a
  *     unique staging dir, and renames it to the final root — losers wait
  *     for the root to appear. The rename is the only publish, so a root
  *     directory exists iff it is complete. (A plain rename race would NOT
  *     work: local-FS rename into an existing directory nests the source
  *     inside it instead of failing.) The fixtures are immutable
  *     (TESTDATA.md), so no invalidation is needed.
  */
object AnnIndex {

  /** Build the sign-LSH index for `d`'s embeddings table at `out`. */
  def build(s: SparkSession, d: String, out: String): Unit = {
    import s.implicits._
    Tables.embeddings(s, d)
      .withColumn("sig", Similarity.sigCol($"embedding"))
      .withColumn("sigp", concat(lit("s"), $"sig"))
      .repartition($"sigp")
      .write.partitionBy("sigp").mode("overwrite").parquet(out)
  }

  /** Number of IVF centroids: the first `IvfCentroids` corpus vectors, by
    * vec_id — deterministic (no trained kmeans state to ship), mirrorable
    * in SQL, and at 100 TB replaced by real trained centroids without
    * changing the operator shape.
    */
  val IvfCentroids = 16

  /** Build the IVF index: each vector assigned to the centroid maximizing
    * the exact dot (ties to the lowest centroid id), written partitioned by
    * cell.
    */
  def buildIvf(s: SparkSession, d: String, out: String): Unit = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val cents = e.filter($"vec_id" < IvfCentroids)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cdot".desc, $"cid".asc)
    e.crossJoin(broadcast(cents))
      .withColumn("cdot",
        graft.functions.VectorFunctions.dot($"embedding", $"cvec"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"label", $"embedding",
        concat(lit("c"), $"cid").as("cellp"))
      .repartition($"cellp")
      .write.partitionBy("cellp").mode("overwrite").parquet(out)
  }

  /** Build-once, claim-arbitrated index location (see the class note). */
  private def locateIndex(
      s: SparkSession, d: String, prefix: String)(
      build: (SparkSession, String, String) => Unit): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"$prefix-$key-v1")
    if (root.isDirectory) return root.toString
    val claim = new java.io.File(root.getParent, s"${root.getName}.claim")
    if (claim.createNewFile()) { // atomic create-new: sole builder
      val staging = new java.io.File(
        root.getParent, s"${root.getName}.stage-${java.util.UUID.randomUUID()}")
      build(s, d, staging.toString)
      if (!staging.renameTo(root)) {
        scala.reflect.io.Directory(staging).deleteRecursively()
        throw new IllegalStateException(
          s"could not publish index at $root (staging: $staging)")
      }
    } else {
      // lost the build race: wait for the winner's rename to land
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!root.isDirectory) {
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"index build claimed but never published — if the builder " +
              s"crashed, delete $claim and retry")
        Thread.sleep(200L)
      }
    }
    root.toString
  }

  /** Sign-LSH index location for fixture dir `d`, building on first use. */
  def locate(s: SparkSession, d: String): String =
    locateIndex(s, d, "graft-ann")(build)

  /** IVF index location for fixture dir `d`, building on first use. */
  def locateIvf(s: SparkSession, d: String): String =
    locateIndex(s, d, "graft-ivf")(buildIvf)

  /** Read the (possibly just-built) sign-LSH index: embeddings + `sig`
    * data column + `sigp` partition column.
    */
  def read(s: SparkSession, d: String): DataFrame =
    s.read.parquet(locate(s, d))

  def readIvf(s: SparkSession, d: String): DataFrame =
    s.read.parquet(locateIvf(s, d))
}
