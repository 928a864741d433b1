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
