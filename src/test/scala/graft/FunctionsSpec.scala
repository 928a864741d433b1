package graft

import graft.functions.{BitSketch, MinHashSignatures}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Input hygiene of the public native expressions: analysis-time type
  * checks, null-element behavior, length-mismatch behavior.
  */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhashes skips null shingles like SQL MIN; all-null array is null") {
    val df = Seq(
      (1L, Seq[String]("a b c", null, "b c d")),
      (2L, Seq[String]("a b c", "b c d")),
      (3L, Seq[String](null, null)),
      (4L, Seq.empty[String])
    ).toDF("id", "shs")
      .select($"id", MinHashSignatures.minhashes($"shs", 4).as("mh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(df(1L) === df(2L), "null element changed the signature")
    assert(df(3L) === null && df(4L) === null)
  }

  test("minhashes rejects non-string arrays at analysis time") {
    val ex = intercept[Exception] {
      Seq(Seq(1, 2)).toDF("xs")
        .select(MinHashSignatures.minhashes($"xs", 2)).collect()
    }
    assert(ex.getMessage.contains("array<string>"), ex.getMessage)
  }

  test("bit_sketch rejects non-float arrays; null on length mismatch") {
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("xs")
        .select(BitSketch.sketch($"xs", 64)).collect()
    }
    assert(ex.getMessage.contains("array<float>"), ex.getMessage)

    val r = Seq(Seq(1.0f, 2.0f)) // dim 2 != 64
      .toDF("xs").select(BitSketch.sketch($"xs", 64, dim = 64)).collect()
    assert(r.head.isNullAt(0))
  }

  test("bit_sketch packs the same bits the 256-char oracle string encodes") {
    // plane p sign for the first embedding row, recomputed independently
    val emb = Tables.embeddings(spark, sf)
      .orderBy($"vec_id").select($"embedding").as[Seq[Float]].head()
    val words = Tables.embeddings(spark, sf).orderBy($"vec_id")
      .select(BitSketch.sketch($"embedding", 256).as("sk"))
      .as[Seq[Long]].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    for (p <- 0 until 256) {
      var acc = 0.0
      for (j <- 0 until 64) {
        val hex = md.digest(s"$p:$j".getBytes("UTF-8"))
        val sign = if (((hex(0) >> 7) & 1) == 1) 1.0 else -1.0
        acc += emb(j).toDouble * sign
      }
      val expected = acc > 0.0
      val got = ((words(p / 64) >> (p % 64)) & 1L) == 1L
      assert(got === expected, s"plane $p bit mismatch")
    }
  }
}
