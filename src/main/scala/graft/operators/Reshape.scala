package graft.operators

import graft.{Ora, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping + analytic-SQL surface: pivot/unpivot, discrete percentiles,
  * deterministic mode, and correlated subqueries (EXISTS + scalar) through
  * the `spark.sql` entry point.
  *
  * Scale shapes: pivot with an EXPLICIT value list is one hash-aggregate
  * (no extra pass to discover the pivot domain — at 100 TB the implicit
  * form's distinct-scan is a full extra job); unpivot is a generator
  * projection (rows x #metrics, no shuffle); percentile_disc is one
  * sort-based aggregate per group; the correlated subqueries decorrelate in
  * Catalyst to plain aggregate + join (verified: no per-row subquery
  * execution survives in the physical plan).
  *
  * Oracle determinism: percentiles pick EXISTING elements (no
  * interpolation arithmetic — fixture doubles carry <= 2 decimals and are
  * compared, never combined); mode is re-expressed as count + deterministic
  * tie-break (both engines' native `mode` breaks ties arbitrarily); money
  * averages go through Ora's exact-decimal shape on both sides.
  */
object Reshape {

  /** q38: pivot orders to one row per priority x {F,O,P} status columns —
    * count + exact-decimal revenue per cell. Explicit pivot values keep it
    * to a single aggregate job.
    */
  def pivotOrders(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), Ora.dsum($"o_totalprice").as("rev"))
      .orderBy($"o_orderpriority")
  }

  val pivotOrdersSql: String = {
    val cells = Seq("F", "O", "P").map { st =>
      s"""COUNT(*) FILTER (WHERE o_orderstatus = '$st') AS ${st}_n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
         |    FILTER (WHERE o_orderstatus = '$st') AS DOUBLE) AS ${st}_rev"""
        .stripMargin
    }.mkString(",\n  ")
    s"""SELECT o_orderpriority,
       |  $cells
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** q39: unpivot part metrics to long form (p_partkey, metric, value) — a
    * generator projection, no shuffle; the int metric is cast to double to
    * share the value column (exact, no arithmetic).
    */
  def unpivotPart(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey", $"p_size".cast("double").as("p_size"), $"p_retailprice")
      .unpivot(
        Array($"p_partkey"),
        Array($"p_size", $"p_retailprice"),
        "metric", "value")
      .orderBy($"p_partkey", $"metric")
  }

  val unpivotPartSql: String =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      |FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  /** q40: discrete percentiles (p50/p90/p99 of l_quantity per return flag)
    * via `percentile_disc` — picks existing elements, so no interpolation
    * arithmetic can diverge between engines — plus a DETERMINISTIC mode
    * (max count, smallest value wins ties; both engines' native `mode`
    * tie-breaks arbitrarily, so it is re-derived from the same count agg).
    */
  def percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val pct = li.groupBy($"l_returnflag").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_quantity)").as("p99"))
    val mode = li.groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"l_returnflag")
      .agg(max(struct($"cnt", (-$"l_quantity").as("nv"))).as("m"))
      .select($"l_returnflag", (-$"m.nv").as("mode_qty"), $"m.cnt".as("mode_n"))
    pct.join(mode, Seq("l_returnflag"))
      .select($"l_returnflag", $"p50", $"p90", $"p99", $"mode_qty", $"mode_n")
      .orderBy($"l_returnflag")
  }

  // percentile_disc(q) == the element at 1-based position ceil(q*n) of the
  // group's sorted multiset; replayed in DuckDB as a row_number pick so the
  // definition (not the engine's quantile flavor) is what is compared.
  val percentilesSql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |pct AS (
      |  SELECT l_returnflag,
      |    MIN(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN l_quantity END) AS p50,
      |    MIN(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN l_quantity END) AS p90,
      |    MIN(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN l_quantity END) AS p99
      |  FROM ranked GROUP BY l_returnflag),
      |counts AS (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY l_returnflag, l_quantity),
      |md AS (
      |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |                       ORDER BY cnt DESC, l_quantity ASC) AS rn
      |  FROM counts)
      |SELECT p.l_returnflag, p.p50, p.p90, p.p99, m.mode_qty, m.mode_n
      |FROM pct p JOIN md m ON p.l_returnflag = m.l_returnflag AND m.rn = 1
      |ORDER BY p.l_returnflag""".stripMargin

  /** q41: correlated EXISTS through `spark.sql` — customers holding at
    * least one urgent filled order above 200k. Catalyst decorrelates the
    * subquery to a left-semi join; this entry pins that surface (the SQL
    * front door + subquery rewrite), not a new physical shape.
    */
  def correlatedExists(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("g_customer")
    Tables.orders(s, d).createOrReplaceTempView("g_orders")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM g_customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM g_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderstatus = 'F'
        |    AND o.o_orderpriority = '1-URGENT'
        |    AND o.o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  val correlatedExistsSql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderstatus = 'F'
      |    AND o.o_orderpriority = '1-URGENT'
      |    AND o.o_totalprice > 200000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q42: correlated SCALAR subquery — orders beating their customer's
    * average order value. The average is Ora's exact-decimal shape INSIDE
    * the subquery so the compared threshold is bit-identical on both
    * engines; Catalyst decorrelates to an aggregate + equi-join.
    */
  def correlatedScalar(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("g_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM g_orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM g_orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val correlatedScalarSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q47: correlated LATERAL subquery — for every nation, its top-2
    * suppliers by account balance, written as the SQL-standard lateral
    * derived table (the "top-N per outer row" idiom ORMs and hand-written
    * analytics both produce). Catalyst decorrelates the limited correlated
    * subquery into a ranked window over one equi-join — same physical shape
    * as q20's top-k — so no nested-loop per-nation execution survives at
    * scale. acctbal is carried, never computed on; unique (balance, key)
    * tie-break inside the lateral ORDER BY.
    */
  def lateralTopK(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("g_nation")
    Tables.supplier(s, d).createOrReplaceTempView("g_supplier")
    s.sql(
      """SELECT n.n_name, t.s_suppkey, t.s_acctbal
        |FROM g_nation n,
        |LATERAL (
        |  SELECT s_suppkey, s_acctbal
        |  FROM g_supplier s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey ASC
        |  LIMIT 2) t
        |ORDER BY n_name, s_suppkey""".stripMargin)
  }

  val lateralTopKSql: String =
    """SELECT n.n_name, t.s_suppkey, t.s_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT s_suppkey, s_acctbal
      |  FROM supplier s
      |  WHERE s.s_nationkey = n.n_nationkey
      |  ORDER BY s_acctbal DESC, s_suppkey ASC
      |  LIMIT 2) t
      |ORDER BY n_name, s_suppkey""".stripMargin

  /** q50: RECURSIVE CTE — hierarchy traversal through Spark's UnionLoop
    * execution (the SQL-standard iterative form; DuckDB mirrors with the
    * identical statement). The hierarchy is the implicit radix-8 tree over
    * customer keys (parent = key div 8, roots = keys 1..7; radix 8 keeps the
    * iteration count — and Spark's per-iteration job floor — at
    * O(log8 N) without changing the operator shape): each row carries its
    * depth and the MAX acctbal seen along its root path — max is a
    * selection, not accumulation, so the double is bit-identical on both
    * engines. Spark executes the recursion as repeated equi-joins against
    * the previous iteration (O(depth) rounds = O(log N) here), the same
    * shape as d6's hand-rolled label propagation — this entry pins the SQL
    * front door for it.
    */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("g_customer")
    s.sql(
      """WITH RECURSIVE chain(c_custkey, depth, path_max_bal) AS (
        |  SELECT c_custkey, 0, c_acctbal
        |  FROM g_customer WHERE c_custkey BETWEEN 1 AND 7
        |  UNION ALL
        |  SELECT c.c_custkey, ch.depth + 1,
        |         greatest(ch.path_max_bal, c.c_acctbal)
        |  FROM g_customer c JOIN chain ch ON c.c_custkey div 8 = ch.c_custkey
        |  WHERE c.c_custkey > 7)
        |SELECT c_custkey, depth, path_max_bal
        |FROM chain
        |ORDER BY c_custkey""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE chain(c_custkey, depth, path_max_bal) AS (
      |  SELECT c_custkey, CAST(0 AS INTEGER), c_acctbal
      |  FROM customer WHERE c_custkey BETWEEN 1 AND 7
      |  UNION ALL
      |  SELECT c.c_custkey, CAST(ch.depth + 1 AS INTEGER),
      |         greatest(ch.path_max_bal, c.c_acctbal)
      |  FROM customer c JOIN chain ch ON c.c_custkey // 8 = ch.c_custkey
      |  WHERE c.c_custkey > 7)
      |SELECT c_custkey, depth, path_max_bal
      |FROM chain
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_recursive_cte"     -> (recursiveCte _),
    "q47_lateral_topk"      -> (lateralTopK _),
    "q38_pivot"             -> (pivotOrders _),
    "q39_unpivot"           -> (unpivotPart _),
    "q40_percentiles"       -> (percentiles _),
    "q41_correlated_exists" -> (correlatedExists _),
    "q42_correlated_scalar" -> (correlatedScalar _))

  val oracle: Map[String, String] = Map(
    "q38_pivot"             -> pivotOrdersSql,
    "q39_unpivot"           -> unpivotPartSql,
    "q40_percentiles"       -> percentilesSql,
    "q41_correlated_exists" -> correlatedExistsSql,
    "q42_correlated_scalar" -> correlatedScalarSql,
    "q47_lateral_topk"      -> lateralTopKSql,
    "q50_recursive_cte"     -> recursiveCteSql)
}
