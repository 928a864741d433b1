package graft

import graft.functions.ShingleHashes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ShingleHashes must be bit-identical (as a sorted set) to the composed
  * split + transform + variadic-xxhash64 + array_distinct pipeline it
  * replaces in d3.
  */
class ShingleHashesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val composed = expr(
    """array_sort(array_distinct(transform(sequence(0, size(w)-3),
      |  i -> xxhash64(w[i], w[i+1], w[i+2]))))""".stripMargin)

  test("matches the composed xxhash64 pipeline on the documents fixture") {
    val rows = Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), " ").as("w"),
        ShingleHashes.shingleHashes(lower($"text"), 3).as("fused"))
      .filter(size($"w") >= 3)
      .select($"doc_id", composed.as("want"), $"fused")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: fused shingle hashes diverge from composed")
    }
  }

  test("edge cases: empty tokens, exact-k, short and empty strings") {
    val cases = Seq(
      "a b c",            // exactly k words
      "a  b c",           // consecutive spaces: empty token preserved
      "a b c ",           // trailing space: trailing empty token
      " a b c",           // leading space
      "wörd ünïcode multi byte token",
      "repeat repeat repeat repeat repeat") // within-doc duplicate shingles
    val df = cases.toDF("text")
      .select($"text", split($"text", " ").as("w"),
        ShingleHashes.shingleHashes($"text", 3).as("fused"))
      .select($"text", composed.as("want"), $"fused")
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"diverged on '${r.getString(0)}'")
    }
    // below k tokens: empty array (composed path filtered these out)
    val short = Seq("", "one", "two words").toDF("text")
      .select(ShingleHashes.shingleHashes($"text", 3).as("h"))
      .collect()
    short.foreach(r => assert(r.getSeq[Long](0).isEmpty))
    // null in, null out
    val n = Seq[Option[String]](None).toDF("text")
      .select(ShingleHashes.shingleHashes($"text", 3).as("h")).collect()
    assert(n.head.isNullAt(0))
  }
}
