package graft.operators

import graft.{Ora, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scan -> filter -> project -> join -> aggregate ->
  * sort (SURVEY.md §2-B groups: projection/filter, joins, aggregation,
  * sort/limit).
  *
  * Every query is declarative DataFrame DSL so Catalyst supplies predicate
  * pushdown, column pruning, join selection and whole-stage codegen; dimension
  * tables (region/nation/supplier — O(100) rows at any scale factor) are
  * explicitly `broadcast()` so the big fact-table joins never shuffle the small
  * side even at 100 TB.
  */
object Relational {
  import Ora._

  /** TPC-H Q1-style pricing summary: the flagship scan->filter->agg->sort.
    * Exercises partial (map-side) aggregation: 6 groups x 32 partitions of
    * partials, trivially scalable.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | ${sqlSum("l_quantity")} AS sum_qty,
       | ${sqlSum("l_extendedprice")} AS sum_base_price,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       | ${sqlAvg("l_quantity")} AS avg_qty,
       | ${sqlAvg("l_extendedprice")} AS avg_price,
       | ${sqlAvg("l_discount")} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate pack: IN, range, LIKE, IS NOT NULL. All four
    * predicates are parquet-pushable (`PushedFilters` in the explain output).
    */
  def q2FilterProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter(
        $"o_orderstatus".isin("O", "F") &&
        $"o_totalprice" >= 1000.0 && $"o_totalprice" < 200000.0 &&
        $"o_orderpriority".like("1%") &&
        $"o_custkey".isNotNull)
      .select(
        $"o_orderkey",
        $"o_custkey",
        concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("status_prio"),
        $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val q2Sql: String =
    """SELECT o_orderkey, o_custkey,
      | o_orderstatus || '-' || o_orderpriority AS status_prio,
      | o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('O','F')
      |  AND o_totalprice >= 1000.0 AND o_totalprice < 200000.0
      |  AND o_orderpriority LIKE '1%'
      |  AND o_custkey IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q5-style multi-way join: fact-fact joins shuffle on their keys,
    * dimension joins broadcast. Revenue per nation.
    */
  def q3JoinRevenue(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
    val ord  = Tables.orders(s, d)
    val li   = Tables.lineitem(s, d)
    val sup  = Tables.supplier(s, d)
    val nat  = Tables.nation(s, d)
    cust
      .join(ord, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q3Sql: String =
    s"""SELECT n_name,
       | ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       | COUNT(*) AS n_items
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project"  -> (q2FilterProject _),
    "q3_join_revenue"    -> (q3JoinRevenue _))

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project"  -> q2Sql,
    "q3_join_revenue"    -> q3Sql)
}
