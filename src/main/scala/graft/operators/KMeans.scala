package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** s9: distributed Lloyd k-means over the embeddings table, bit-exact
  * against the DuckDB oracle.
  *
  * Trained float k-means can't be oracle-replayed (per-component means
  * depend on reduction order), so the whole algorithm runs in INTEGER
  * space: every vector quantizes to q_i = floor(e_i · 2^20) — a
  * power-of-two double multiply is exact and floor has no rounding mode,
  * so both engines derive identical integers — and from there distances
  * (Σ diff², order-free integer sums), argmin assignment (tie-break lowest
  * cluster id), and centroid updates (floor-division via pmod, identical
  * on both engines for negative sums) are all exact. The quantization is
  * part of the algorithm's definition, not an approximation being waved
  * through: 2^-20 resolution is far below any embedding's noise floor.
  *
  * Execution shape is the MLlib one, built directly on the public RDD API
  * (the canonical "genuine per-partition imperative logic" case): the k
  * centroids broadcast, each partition folds its own k×dim partial sums +
  * counts while assigning, and partials merge up a tree — ONE pass over
  * the data per Lloyd round, no shuffle at all (the k×dim stats object is
  * a few KB however large the corpus). The final assignment pass is the
  * same map. At 100 TB this is exactly how you'd train IVF centroids for
  * [[AnnIndex]].
  */
object KMeans {
  /** Cluster count; initial centroids are the vectors with vec_id < K. */
  val K = 4

  /** Quantization scale 2^20 (exact double multiply, see scaladoc). */
  val QScale = 1048576L

  /** Fixture embedding dimensionality (mirrored literally in the oracle's
    * range(1, Dim+1) component unrolling).
    */
  val Dim = 64

  /** Argmin over centroids: squared L2 in exact integer math, strict `<`
    * so ties keep the earliest (lowest-cid) centroid — the oracle mirrors
    * with ORDER BY dist, cid.
    */
  private[graft] def assign(
      q: Array[Long], cents: Array[(Int, Array[Long])]): (Int, Long) = {
    var bestCid = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)._2
      var acc = 0L
      var i = 0
      while (i < q.length) { val t = q(i) - cc(i); acc += t * t; i += 1 }
      if (acc < bestD) { bestD = acc; bestCid = cents(c)._1 }
      c += 1
    }
    (bestCid, bestD)
  }

  /** Floor division that both engines reproduce for negative sums:
    * subtract the positive mod, then the division is exact.
    */
  private[graft] def fld(a: Long, n: Long): Long = (a - (((a % n) + n) % n)) / n

  def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assignments(s, d).orderBy($"vec_id")
  }

  /** Quantized corpus RDD (persisted: training makes 3 passes over it;
    * ContextCleaner frees it when the last reference drops).
    */
  private[graft] def quantized(
      s: SparkSession, d: String): org.apache.spark.rdd.RDD[(Long, Array[Long])] = {
    import s.implicits._
    val q = Tables.embeddings(s, d)
      .select($"vec_id", expr(
        s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT))")
        .as("q"))
      .as[(Long, Seq[Long])]
      .rdd.map { case (id, v) => (id, v.toArray) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(q.first()._2.length == Dim, s"expected $Dim-dim embeddings")
    q
  }

  /** First-k init + ONE Lloyd round over the quantized corpus — the
    * reusable trainer: s9 consumes it at K=4, [[AnnIndex.buildIvf]] at 16
    * (trained IVF cells), [[Pq]] at 8 per SUBSPACE (hence the `dim`
    * parameter — PQ trains on 16-component slices, not full vectors).
    * Returns the updated integer centroids, empty cells dropped; exact
    * replay = [[lloydCtes]].
    */
  private[graft] def train(
      s: SparkSession, q: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      k: Int, dim: Int = Dim): Array[(Int, Array[Long])] = {
    val init: Array[(Int, Array[Long])] = q.filter(_._1 < k).collect()
      .sortBy(_._1).map { case (id, v) => (id.toInt, v) }

    // One Lloyd round: assign + fold per-cluster (count, component sums)
    // in a single tree-aggregated pass.
    val bc = s.sparkContext.broadcast(init)
    val zero = (new Array[Long](k), Array.fill(k)(new Array[Long](dim)))
    val (counts, sums) = q.treeAggregate(zero)(
      { case ((cnt, sm), (_, v)) =>
        val cid = assign(v, bc.value)._1
        cnt(cid) += 1
        val target = sm(cid)
        var i = 0
        while (i < dim) { target(i) += v(i); i += 1 }
        (cnt, sm)
      },
      { case ((c1, s1), (c2, s2)) =>
        var c = 0
        while (c < k) {
          c1(c) += c2(c)
          var i = 0
          while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
          c += 1
        }
        (c1, s1)
      })
    (0 until k).filter(counts(_) > 0L).map { c =>
      (c, sums(c).map(fld(_, counts(c))))
    }.toArray
  }

  /** One-Lloyd-round cluster assignment, unsorted — the reusable half of
    * [[kmeansAssign]]: d9's semantic dedup consumes this mid-plan (cluster
    * membership as the pair-enumeration scope) without paying the total
    * sort s9's query contract needs.
    */
  private[graft] def assignments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q = quantized(s, d)
    val cents = train(s, q, K)

    // Final assignment with the updated centroids.
    val bc2 = s.sparkContext.broadcast(cents)
    q.map { case (id, v) =>
      val (cid, dist) = assign(v, bc2.value)
      (id, cid, dist)
    }.toDF("vec_id", "cluster", "dist")
  }

  /** The trained-centroid CTE chain (exact SQL replay of [[train]]):
    * `q` (quantized corpus), `c0` (first-k init), `a1` (round-1
    * assignment), `c1` (cid, trained integer centroid list). Shared by the
    * s9 oracle (k=4) and the s4 trained-IVF oracle (k=16).
    */
  private[graft] def lloydCtes(k: Int): String =
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cid, q AS c FROM q WHERE vec_id < $k),
       |d1 AS (
       |  SELECT v.vec_id, c.cid,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT) AS dist
       |  FROM q v CROSS JOIN c0 c),
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |comp1 AS (
       |  SELECT a.cid, t.i,
       |    CAST(SUM(v.q[t.i]) AS BIGINT) AS s, COUNT(*) AS n
       |  FROM a1 a JOIN q v USING (vec_id)
       |  CROSS JOIN range(1, ${Dim + 1}) t(i)
       |  GROUP BY a.cid, t.i),
       |c1 AS MATERIALIZED (
       |  SELECT cid, list((s - ((s % n + n) % n)) // n ORDER BY i) AS c
       |  FROM comp1 GROUP BY cid)""".stripMargin

  /** Oracle: the identical two-pass Lloyd round in SQL — quantize, assign
    * against the first-K centroids, recompute centroids with the same
    * pmod floor-division, re-assign. All-integer end to end.
    */
  val kmeansAssignSql: String =
    s"""WITH __LLOYD__,
       |d2 AS (
       |  SELECT v.vec_id, c.cid,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT) AS dist
       |  FROM q v CROSS JOIN c1 c)
       |SELECT vec_id, cid AS cluster, dist FROM (
       |  SELECT vec_id, cid, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM d2) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
      .replace("__LLOYD__", lloydCtes(K))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_kmeans" -> (kmeansAssign _))

  val oracle: Map[String, String] = Map(
    "s9_kmeans" -> kmeansAssignSql)
}
