package graft

import graft.functions.HllSketchAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native HLL aggregate (u9): bit-parity with q43's SQL register algebra,
  * plus the merge laws that make the 64-byte buffer a safe distributed
  * aggregate (any partial-merge tree lands on identical registers).
  */
class HllAggSpec extends AnyFunSuite {
  import TestSpark._

  private def sketchOf(keys: Seq[String]): Array[Byte] = {
    val regs = new Array[Byte](64)
    keys.foreach { k =>
      val (b, rho) = HllSketchAgg.bucketRho(k.getBytes("UTF-8"))
      if (rho > (regs(b) & 0xff)) regs(b) = rho.toByte
    }
    regs
  }

  test("bucketRho matches the SQL md5 rho derivation on fixture keys") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, sf)
      .select($"l_orderkey".cast("string").as("k"),
        md5($"l_orderkey".cast("string")).as("h"))
      .select($"k",
        expr("CAST(conv(substring(h, 1, 2), 16, 10) AS INT) % 64").as("b"),
        expr("length(regexp_extract(substring(h, 3, 15), '^(0*)', 1))").as("z"),
        $"h")
      .select($"k", $"b",
        expr(
          """CASE WHEN z = 15 THEN 61
            |     ELSE z * 4 + (CASE
            |       WHEN CAST(conv(substring(h, 3 + z, 1), 16, 10) AS INT) >= 8 THEN 0
            |       WHEN CAST(conv(substring(h, 3 + z, 1), 16, 10) AS INT) >= 4 THEN 1
            |       WHEN CAST(conv(substring(h, 3 + z, 1), 16, 10) AS INT) >= 2 THEN 2
            |       ELSE 3 END) + 1 END""".stripMargin).as("rho"))
      .distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, rho) = HllSketchAgg.bucketRho(r.getString(0).getBytes("UTF-8"))
      assert(b === r.getInt(1), s"bucket for key ${r.getString(0)}")
      assert(rho === r.getInt(2), s"rho for key ${r.getString(0)}")
    }
  }

  test("merge is bytewise max: associative, commutative, idempotent") {
    val keys = (1 to 3000).map(i => (i * 7919).toString)
    val parts = keys.grouped(1000).map(sketchOf).toSeq
    def mrg(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.zip(b).map { case (x, y) => math.max(x & 0xff, y & 0xff).toByte }
    val leftFold = parts.reduceLeft(mrg)
    val rightFold = parts.reduceRight(mrg)
    val direct = sketchOf(keys)
    assert(leftFold.toSeq === direct.toSeq)
    assert(rightFold.toSeq === direct.toSeq)
    assert(mrg(direct, direct).toSeq === direct.toSeq)
    assert(HllSketchAgg.evalRegisters(leftFold) ===
      HllSketchAgg.evalRegisters(direct))
  }

  test("u9 native aggregate equals q43's SQL register build (shared columns)") {
    import spark.implicits._
    val native = operators.Extensibility.nativeHllAgg(spark, sf)
      .select($"l_returnflag", $"hll_s_hi", $"hll_s_lo", $"hll_estimate")
      .collect().map(_.toSeq)
    val sqlPath = operators.Aggregates.hllDeterministic(spark, sf)
      .select($"l_returnflag", $"hll_s_hi", $"hll_s_lo", $"hll_estimate")
      .collect().map(_.toSeq)
    assert(native.toSeq === sqlPath.toSeq)
  }
}
