package graft.operators

import graft.{Ora, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface: distinct counts, HAVING, ROLLUP / CUBE / GROUPING
  * SETS, approximate distinct (SURVEY.md §2-B "aggregation").
  *
  * All group-bys partial-aggregate map-side before the shuffle (Tungsten hash
  * aggregate), so the shuffled volume is O(groups), not O(rows) — the property
  * that keeps these plans viable at 100 TB. `approx_count_distinct` is the HLL
  * path whose sketch merges associatively across 1000 executors; its exact
  * value is implementation-specific so it is declared rows-only (no oracle).
  */
object Aggregates {
  import Ora._

  /** COUNT(DISTINCT) + plain count per group. */
  def aggDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  val aggDistinctSql: String =
    """SELECT o_orderstatus,
      | COUNT(DISTINCT o_custkey) AS n_cust,
      | COUNT(DISTINCT o_orderpriority) AS n_prio,
      | COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** HAVING: big-spender customers only (filter over an aggregate). */
  def having(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(dsum($"o_totalprice").as("total"), count(lit(1)).as("n_orders"))
      .filter($"total" > 400000.0)
      .orderBy($"o_custkey")
  }

  val havingSql: String =
    s"""SELECT o_custkey, ${sqlSum("o_totalprice")} AS total, COUNT(*) AS n_orders
       |FROM orders
       |GROUP BY o_custkey
       |HAVING ${sqlSum("o_totalprice")} > 400000.0
       |ORDER BY o_custkey""".stripMargin

  /** ROLLUP over (status, priority): subtotals + grand total. Grouping
    * columns have no data NULLs, so rollup NULLs are unambiguous.
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy(
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val rollupSql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       | COUNT(*) AS n, ${sqlSum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** CUBE over (returnflag, linestatus). */
  def cubeAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy(
        $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val cubeSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** GROUPING SETS via SQL (the DSL surface for this is SQL-first). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** HLL approximate distinct — rows-only check (sketch values are
    * engine-specific; DuckDB's approx_count_distinct uses a different HLL).
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey").as("approx_orders"),
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_agg_distinct"    -> (aggDistinct _),
    "q11_agg_having"      -> (having _),
    "q12_agg_rollup"      -> (rollupAgg _),
    "q13_agg_cube"        -> (cubeAgg _),
    "q14_agg_gsets"       -> (groupingSets _),
    "q15_agg_approx_hll"  -> (approxDistinct _))

  val oracle: Map[String, String] = Map(
    "q10_agg_distinct" -> aggDistinctSql,
    "q11_agg_having"   -> havingSql,
    "q12_agg_rollup"   -> rollupSql,
    "q13_agg_cube"     -> cubeSql,
    "q14_agg_gsets"    -> groupingSetsSql)
}
