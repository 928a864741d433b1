package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global ROW_NUMBER / NTILE without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole relation
  * into ONE task — fixture-correct, 100 TB-fatal. This generalizes p14's
  * distributed rank ([[Pipeline.epochShuffleOf]]'s hash-prefix bucketing)
  * to arbitrary sort keys: bucket rows by a MONOTONE function of the
  * leading sort column, rank inside each bucket in parallel (one
  * [[Buckets]]-way partitioned window), and add each bucket's cumulative
  * row offset back. Because the bucket is monotone w.r.t. the sort order,
  * `global rank = bucket offset + local rank` holds EXACTLY — the output
  * is bit-identical to a flat ROW_NUMBER / NTILE, so the DuckDB oracles
  * of every query that switches constructions stay untouched.
  *
  * For a numeric leading column the monotone bucket is a uniform
  * [lo, hi] range split with the bounds frozen as literals from one exact
  * min/max aggregate. Each rank costs two bounded driver pre-passes
  * (min/max: 1 row; per-bucket counts: <= [[Buckets]] rows — the KMeans
  * bounded-collect pattern), both over exact deterministic aggregates, so
  * the frozen literals are identical however many times the plan is
  * replayed (no persist needed — nothing here resamples). Value skew only
  * unbalances buckets (a perf concern the uniform split already bounds at
  * corpus-range granularity), never the rank math; tied leading values
  * share a bucket by construction.
  *
  * NTILE(k) is then pure arithmetic on the global rank with ANSI bucket
  * sizes — the first `N mod k` buckets get one extra row — matching
  * Spark's and DuckDB's NTILE exactly.
  */
object DistRank {
  /** Ranking parallelism: enough buckets to keep a 1000-executor shuffle
    * wide, few enough that the counts pre-pass stays a trivial collect. */
  val Buckets = 256

  /** Monotone uniform bucket for `c` over frozen [lo, hi]. IEEE subtract /
    * divide-by-positive / multiply-by-positive / floor are all monotone,
    * so bucket order is consistent with value order; `desc` flips the
    * bucket ids so they stay monotone w.r.t. a DESC leading sort. */
  private def uniformBucket(c: Column, lo: Double, hi: Double,
      desc: Boolean): Column = {
    val asc =
      if (hi <= lo) lit(0L)
      else least(lit(Buckets - 1L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * Buckets))
    if (desc) lit(Buckets - 1L) - asc else asc
  }

  private def minMax(df: DataFrame, c: Column): (Double, Double) = {
    val r = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    if (r.isNullAt(0)) (0.0, 0.0) else (r.getDouble(0), r.getDouble(1))
  }

  /** Core: adds `__drk_rank` (1-based global BIGINT row number over
    * `order`) given a caller-supplied bucket column that is monotone
    * non-decreasing w.r.t. `order`; returns the frame plus total N. */
  private def ranked(df: DataFrame, bucket: Column,
      order: Seq[Column]): (DataFrame, Long) = {
    val s = df.sparkSession
    import s.implicits._
    val withB = df.withColumn("__drk_b", bucket)
    val counts = withB.groupBy($"__drk_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.toSeq.map { case (b, n) =>
      val off = acc; acc += n; (b, off)
    }
    val offsets = offRows.toDF("__drk_b", "__drk_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"__drk_b").orderBy(order: _*)
    val out = withB
      .withColumn("__drk_r", row_number().over(w).cast("long"))
      .join(broadcast(offsets), Seq("__drk_b"))
      .withColumn("__drk_rank", $"__drk_off" + $"__drk_r")
      .drop("__drk_b", "__drk_off", "__drk_r")
    (out, acc)
  }

  /** Global row_number named `out` (BIGINT) over a caller-supplied
    * monotone bucket — for composite sort keys whose leading columns
    * admit a direct monotone encoding (p17's (stage, hex-coin prefix)). */
  def withRowNumberBucketed(df: DataFrame, bucket: Column, out: String,
      order: Seq[Column]): DataFrame =
    ranked(df, bucket, order)._1.withColumnRenamed("__drk_rank", out)

  /** Global row_number named `out` (BIGINT) ordered by the numeric
    * `leading` column (asc, or desc when `desc`) then `ties`. */
  def withRowNumber(df: DataFrame, out: String, leading: Column,
      desc: Boolean, ties: Seq[Column]): DataFrame = {
    val (lo, hi) = minMax(df, leading)
    val ord = (if (desc) leading.desc else leading.asc) +: ties
    withRowNumberBucketed(df, uniformBucket(leading, lo, hi, desc), out, ord)
  }

  /** Global NTILE(k) named `out` (INT, matching the builtin's type) over
    * (`leading` asc/desc, `ties`): ANSI sizes via arithmetic on the
    * distributed rank — first N mod k buckets get one extra row. */
  def withNtile(df: DataFrame, k: Int, out: String, leading: Column,
      desc: Boolean, ties: Seq[Column]): DataFrame = {
    val (lo, hi) = minMax(df, leading)
    val ord = (if (desc) leading.desc else leading.asc) +: ties
    val (r, n) = ranked(df, uniformBucket(leading, lo, hi, desc), ord)
    val q = n / k
    val rem = n % k
    val cut = rem * (q + 1)
    val tile =
      if (n == 0L) lit(1)
      else if (rem == 0L) expr(s"(__drk_rank - 1) div $q + 1")
      else expr(
        s"CASE WHEN __drk_rank <= $cut THEN (__drk_rank - 1) div ${q + 1} + 1 " +
        s"ELSE $rem + (__drk_rank - $cut - 1) div ${math.max(q, 1L)} + 1 END")
    r.withColumn(out, tile.cast("int")).drop("__drk_rank")
  }
}
