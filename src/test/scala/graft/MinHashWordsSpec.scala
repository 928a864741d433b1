package graft

import graft.functions.{MinHashSignatures, MinHashWords}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-identity of the fused [[MinHashWords]] (shingling inside the digest
  * loop) against the composed form it replaces: Catalyst
  * `transform(sequence(...), i -> concat_ws(' ', slice(w, i+1, k)))` piped
  * into [[MinHashSignatures]] — the equivalence the d2/p4 oracle SQL
  * depends on.
  */
class MinHashWordsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // The composed form is only defined for size(w) >= k: sequence(0, size-k)
  // with size < k produces a DESCENDING sequence and slice(w, 0, k) throws.
  // Production callers (Dedup.scala) filter size(w) >= k before shingling;
  // MinHashWords itself returns null for shorter inputs, so the guard here
  // makes the composed reference agree on the same rows.
  private def composed(k: Int, seeds: Int) =
    MinHashSignatures.minhashes(
      expr(s"if(size(w) >= $k, " +
        s"transform(sequence(0, size(w)-$k), i -> concat_ws(' ', slice(w, i+1, $k))), " +
        "null)"),
      seeds)

  test("matches the composed transform+minhashes form on random word arrays") {
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("the", "a", "fox", "jumps", "", "über", "naïve", "日本", "x1", "zz")
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "w")
      .select($"id",
        MinHashWords.minhashWords($"w", 3, 8).as("fused"),
        composed(3, 8).as("comp"))
      .collect()
    df.foreach { r =>
      val fused = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val comp = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(fused === comp, s"row id=${r.getLong(0)}")
    }
  }

  test("matches on the real documents fixture (the d2 input)") {
    val rows = Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id",
        MinHashWords.minhashWords($"w", 3, 8).as("fused"),
        composed(3, 8).as("comp"))
      .filter(not($"fused" <=> $"comp"))
      .count()
    assert(rows === 0L)
  }

  test("null words are skipped like concat_ws; fewer than k words yields null") {
    val df = Seq(
      (1L, Seq[String]("a", null, "b", "c")),
      (2L, Seq[String]("a", "b", "c")),
      (3L, Seq[String]("a", "b")),
      (4L, Seq.empty[String])
    ).toDF("id", "w")
      .select($"id",
        MinHashWords.minhashWords($"w", 3, 8).as("fused"),
        composed(3, 8).as("comp"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getSeq[String](1)),
         (if (r.isNullAt(2)) null else r.getSeq[String](2))))
      .toMap
    // fused == composed on every row, including the null-element row: the
    // composed concat_ws skips nulls the same way
    df.foreach { case (id, (fused, comp)) => assert(fused === comp, s"id=$id") }
    assert(df(3L)._1 === null && df(4L)._1 === null)
  }

  test("rejects non-string arrays at analysis time") {
    val ex = intercept[Exception] {
      Seq(Seq(1, 2, 3)).toDF("w")
        .select(MinHashWords.minhashWords($"w", 3, 8)).collect()
    }
    assert(ex.getMessage.contains("array<string>"), ex.getMessage)
  }
}
