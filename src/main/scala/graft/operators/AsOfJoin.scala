package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` (at-or-before, ties included) within the same key — an operator Spark lacks
  * natively (SURVEY.md §2-B "joins": as-of).
  *
  * Implemented by composition (preference order (a) from the build contract):
  * union the two sides tagged by origin, single shuffle on the key, one
  * ordered window pass carrying the last right-side timestamp forward. That is
  * the merge-join formulation — O(n log n) in the partition, one shuffle
  * total, no range-explosion — and it survives 100 TB because the shuffle is
  * by key, the window never materializes the cross product, and skewed keys
  * can be salted upstream without changing the algorithm.
  */
object AsOfJoin {

  /** Generic as-of: returns `left` plus `asof_<valueCol>` = the right row's
    * value column from the latest right row at-or-before the left row's
    * time (per key); a right row at the exact same timestamp matches, like
    * most as-of implementations' backward-inclusive default.
    *
    * @param leftTimeCol / rightTimeCol  event-time columns (same type)
    * @param keyCols                     equi-key column names present on both sides
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftTimeCol: String,
      rightTimeCol: String,
      keyCols: Seq[String],
      valueCol: String,
      tieBreakCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
        keyCols.map(col) :+ col(rightTimeCol).as("_t") :+
          col(valueCol).as("_v") :+ col(tieBreakCol).as(tieBreakCol + "_r"): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // _side asc puts right rows BEFORE left rows at equal _t, so the
    // (unboundedPreceding, -1) frame includes same-timestamp right rows =>
    // at-or-before (inclusive) semantics; the oracle orders identically.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col(tieBreakCol + "_r").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn("_asof",
        last(when(col("_side") === 0, col("_v")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_t", "_v", tieBreakCol + "_r")
      .withColumnRenamed("_asof", s"asof_$valueCol")
  }

  /** Query entry: for each purchase event, the value of the same user's most
    * recent prior click.
    */
  def purchaseAsOfClick(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts", $"value")
    asOf(purchases, clicks,
      leftTimeCol = "ts", rightTimeCol = "ts", keyCols = Seq("user_id"),
      valueCol = "value", tieBreakCol = "event_id")
      .select($"user_id", $"event_id", $"value",
        col("asof_value").as("prev_click_value"))
      .orderBy($"user_id", $"event_id")
  }

  /** Oracle: windowed formulation over the tagged union — identical
    * semantics, expressed with LAST_VALUE IGNORE NULLS.
    */
  val purchaseAsOfClickSql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |w AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, side, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_value
      |  FROM tagged)
      |SELECT user_id, event_id, value, prev_click_value
      |FROM w WHERE side = 1
      |ORDER BY user_id, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_asof_join" -> (purchaseAsOfClick _))

  val oracle: Map[String, String] = Map(
    "q35_asof_join" -> purchaseAsOfClickSql)
}
