package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted joins and bucketed co-located joins — the
  * two knobs the 100 TB plan reaches for when AQE alone isn't enough
  * (SURVEY.md §7: "broadcast small dims, repartition/bucketing for co-located
  * joins, salting for skew").
  */
object Scale {

  /** Inner equi-join where `big`'s key distribution is heavily skewed:
    * replicate each `small` row `saltFactor` times and scatter `big` rows
    * across salts deterministically, so one hot key spreads over
    * `saltFactor` reducers instead of melting one. Result is row-identical
    * to `big.join(small, key)`.
    *
    * AQE's skew-join split handles sort-merge spills automatically; explicit
    * salting is for the cases AQE can't re-plan (e.g. aggregations after the
    * join keyed on the same hot key, or pre-4.x clusters).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, saltFactor: Int,
      bigUniqueCol: String): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(bigUniqueCol)), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a DataFrame bucketed+sorted by `key` so subsequent equi-joins on
    * `key` between co-bucketed tables need NO shuffle (and no sort): the
    * pre-shuffled layout is the amortize-once answer for repeated fact-fact
    * joins at 100 TB.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
