package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("FloatDot (native expression) is bit-identical to the HOF form") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(200)
    val both = e.crossJoin(
        broadcast(e.filter($"vec_id" === 0).select($"embedding".as("qv"))))
      .select(
        VectorFunctions.dot($"embedding", $"qv").as("native"),
        VectorFunctions.dotHof($"embedding", $"qv").as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("unit vectors: cosine == dot, l2Norm ~ 1") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(20)
    val rows = e.select(VectorFunctions.l2Norm($"embedding").as("n")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-3))
  }

  test("MaxSimScore (native) equals the HOF formulation and handles ragged input") {
    import spark.implicits._
    val quant = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))")
    val e = Tables.embeddings(spark, sf).limit(200).select($"vec_id", quant.as("q"))
    val hof =
      """aggregate(
        |  transform(sequence(0, 3), qt ->
        |    array_max(transform(sequence(0, 3), dt ->
        |      aggregate(zip_with(slice(qq, qt * 16 + 1, 16), slice(q, dt * 16 + 1, 16),
        |          (x, y) -> x * y),
        |        CAST(0 AS BIGINT), (a, v) -> a + v)))),
        |  CAST(0 AS BIGINT), (a, v) -> a + v)""".stripMargin
    val both = e.crossJoin(
        broadcast(e.filter($"vec_id" === 0).select($"q".as("qq"))))
      .select(
        graft.functions.MaxSimScore.maxsim($"q", $"qq", 4).as("native"),
        expr(hof).as("hofv"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // ragged input -> null, not a wrong score
    val ragged = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
      .select(graft.functions.MaxSimScore.maxsim($"a", $"b", 4).as("m"))
      .collect()
    assert(ragged.head.isNullAt(0))
  }

  test("MaxSimScore participates in whole-stage codegen") {
    import spark.implicits._
    val quant = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))")
    val e = Tables.embeddings(spark, sf).select($"vec_id", quant.as("q"))
    val df = e.filter($"vec_id" >= 0)
      .select(graft.functions.MaxSimScore.maxsim($"q", $"q", 4).as("m"))
    df.collect()
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty)
  }

  test("FloatDot participates in whole-stage codegen (no fallback errors)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val df = e.filter($"vec_id" >= 0)
      .select(VectorFunctions.dot($"embedding", $"embedding").as("d"))
    df.collect() // force execution: a codegen compile failure would log+fallback
    val plan = df.queryExecution.executedPlan
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, s"no WholeStageCodegenExec in:\n${plan.treeString}")
  }
}
