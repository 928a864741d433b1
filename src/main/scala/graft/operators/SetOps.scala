package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation surface: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT
  * (SURVEY.md §2-B "set ops"; reference analogue: last-writer-wins map merge
  * server.go:385-393 is a union-by-key).
  *
  * INTERSECT/EXCEPT hash-shuffle on the full row — fine here because we
  * project to the key columns first (always project before a set op; the
  * shuffle then carries only the key bytes).
  */
object SetOps {

  private def custNations(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))

  private def suppNations(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))

  /** UNION ALL + re-aggregate: nation frequency across customers+suppliers. */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custNations(s, d).unionAll(suppNations(s, d))
      .groupBy($"nationkey")
      .agg(count(lit(1)).as("n"))
      .orderBy($"nationkey")
  }

  val unionAllSql: String =
    """SELECT nationkey, COUNT(*) AS n
      |FROM (SELECT c_nationkey AS nationkey FROM customer
      |      UNION ALL
      |      SELECT s_nationkey FROM supplier) u
      |GROUP BY nationkey
      |ORDER BY nationkey""".stripMargin

  /** UNION (distinct semantics). */
  def unionDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custNations(s, d).union(suppNations(s, d)).distinct()
      .orderBy($"nationkey")
  }

  val unionDistinctSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** INTERSECT: nations having both customers and suppliers. */
  def intersectOp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custNations(s, d).intersect(suppNations(s, d)).orderBy($"nationkey")
  }

  val intersectSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** EXCEPT: nations with customers but no suppliers. */
  def exceptOp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    custNations(s, d).except(suppNations(s, d)).orderBy($"nationkey")
  }

  val exceptSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** q49: the bag-semantics set ops — INTERSECT ALL / EXCEPT ALL — closing
    * the set surface (q22–q25 cover the distinct forms). Multiplicity
    * matters: a nation with 3 customer rows and 2 supplier rows
    * intersects-all to 2 rows and excepts-all to 1 — so the result is
    * aggregated to (nationkey, n) to keep a total ORDER BY. Both engines
    * implement bag semantics identically (min / difference of
    * multiplicities); the
    * shuffle carries only the projected key, like the distinct forms.
    */
  def bagOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ia = custNations(s, d).intersectAll(suppNations(s, d))
      .groupBy($"nationkey").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val ea = custNations(s, d).exceptAll(suppNations(s, d))
      .groupBy($"nationkey").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    ia.unionByName(ea)
      .select($"op", $"nationkey", $"n")
      .orderBy($"op", $"nationkey")
  }

  val bagOpsSql: String =
    """WITH ia AS (
      |  SELECT nationkey, COUNT(*) AS n FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    INTERSECT ALL
      |    SELECT s_nationkey FROM supplier) t
      |  GROUP BY nationkey),
      |ea AS (
      |  SELECT nationkey, COUNT(*) AS n FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    EXCEPT ALL
      |    SELECT s_nationkey FROM supplier) t
      |  GROUP BY nationkey)
      |SELECT 'intersect_all' AS op, nationkey, n FROM ia
      |UNION ALL
      |SELECT 'except_all', nationkey, n FROM ea
      |ORDER BY op, nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_bag_setops" -> (bagOps _),
    "q22_union_all"      -> (unionAll _),
    "q23_union_distinct" -> (unionDistinct _),
    "q24_intersect"      -> (intersectOp _),
    "q25_except"         -> (exceptOp _))

  val oracle: Map[String, String] = Map(
    "q22_union_all"      -> unionAllSql,
    "q23_union_distinct" -> unionDistinctSql,
    "q24_intersect"      -> intersectSql,
    "q25_except"         -> exceptSql,
    "q49_bag_setops"     -> bagOpsSql)
}
