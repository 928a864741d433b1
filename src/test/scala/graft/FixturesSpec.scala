package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire (r10 verdict #2). The driver regenerates
  * `/root/testdata` between rounds and has already changed physical types
  * under the suite once (events.ts timestamp[ns] → timestamp[us] on
  * 2026-08-13, which silently broke 14 queries). This spec pins every
  * fixture invariant the suite *relies on* so the next regeneration fails
  * loud with a one-line diagnosis instead of 14 cryptic analysis errors.
  *
  * On failure: the fixture was regenerated — re-derive the invariant, then
  * update FIXTURES.md and the code that depends on it (listed per test).
  */
class FixturesSpec extends AnyFunSuite {
  import TestSpark._

  private def raw(name: String) = {
    // same legacy conf Tables.events sets, so a ns-era fixture loads at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/$name.parquet")
  }

  test("events.ts is one of the shapes Tables.normalizeEventsTs handles") {
    val t = raw("events").schema("ts").dataType
    assert(t == LongType || t == TimestampNTZType || t == TimestampType,
      s"fixture regenerated: events.ts is $t — extend " +
        "Tables.normalizeEventsTs (Tables.scala) + eventsStream and " +
        "re-derive FIXTURES.md")
  }

  test("events loader surfaces session-UTC TimestampType regardless of shape") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("events.props is exactly {\"k\": <int>} per row (q51 oracle contract)") {
    // q51's oracle builds a fixed 3-key MAP {'k','t','u'}; a props payload
    // with 't'/'u' keys would throw DUPLICATED_MAP_KEY, and any non-int
    // value changes the map value type. CLAUDE.md documents this contract.
    val bad = raw("events")
      .filter(not(col("props").rlike("""^\{"k": -?\d+\}$""")))
      .count()
    assert(bad == 0L,
      s"fixture regenerated: $bad events.props rows are not {\"k\": <int>} " +
        "— q51_map_fns and its oracle SQL must be re-derived")
  }

  test("fixture row counts are stable per SF (the windowed/cap constants are fixture-empirical)") {
    // A regeneration that keeps every TYPE but changes ROW COUNTS silently
    // shifts every selectivity-tuned constant (d5's hamming cap 110, s23's
    // RangeR, d2's bucket caps, q69's pane universe...) — the failure mode
    // the ts-shape pins can't catch. FIXTURES.md §"fixture-empirical
    // constants" lists what to re-derive when this trips.
    val expected = Map(
      ("sf0.001", "events") -> 1000L,
      ("sf0.001", "documents") -> 500L,
      ("sf0.001", "embeddings") -> 500L,
      ("sf0.01", "events") -> 10000L,
      ("sf0.01", "documents") -> 500L,
      ("sf0.01", "embeddings") -> 500L,
      ("sf0.1", "events") -> 100000L,
      ("sf0.1", "documents") -> 5000L,
      ("sf0.1", "embeddings") -> 2000L)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.foreach { case ((sfd, t), n) =>
      val f = s"/root/testdata/$sfd/$t.parquet"
      if (new java.io.File(f).exists) {
        val got = spark.read.parquet(f).count()
        assert(got === n,
          s"fixture regenerated: $sfd/$t has $got rows (pinned $n) — " +
            "re-derive the fixture-empirical constants per FIXTURES.md")
      }
    }
  }

  test("documents.text is pure ASCII (m6 audio oracle relies on ord==byte)") {
    val nonAscii = raw("documents")
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0L,
      s"fixture regenerated: $nonAscii documents.text rows contain " +
        "non-ASCII — m6_audio_energy's byte/char equivalence breaks")
  }

  test("embeddings.embedding is array<float> (FloatDot/BitSketch expression input)") {
    val t = raw("embeddings").schema("embedding").dataType
    assert(t == ArrayType(FloatType, containsNull = true) ||
      t == ArrayType(FloatType, containsNull = false),
      s"fixture regenerated: embeddings.embedding is $t — native float " +
        "expressions (FloatDot, BitSketch, MinHashSignatures) assume " +
        "ArrayData of floats")
  }

  test("normalizeEventsTs yields identical instants for all three ts shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // One logical instant written three ways; the loader must surface the
    // SAME session-UTC TimestampType value from each — the invariant that
    // lets the oracle SQLs survive any future driver regen in either
    // direction.
    val base = java.nio.file.Files.createTempDirectory("graft-tsshapes")
    val micros = Seq(0L, 1L, 1721649600000000L, -7L) // epoch, +1us, 2024, pre-epoch
    micros.toDF("us").select(col("us") * 1000L)
      .toDF("ts").write.parquet(s"$base/ns_long")      // ns as raw longs
    micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType))
      .toDF("ts").write.parquet(s"$base/ntz")          // us, NTZ
    micros.toDF("us").select(timestamp_micros(col("us")))
      .toDF("ts").write.parquet(s"$base/utc")          // us, instant
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def loaded(sub: String): Seq[Long] =
      Tables.normalizeEventsTs(spark.read.parquet(s"$base/$sub"))
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    val fromLong = loaded("ns_long")
    assert(fromLong === micros.sorted)
    assert(loaded("ntz") === fromLong)
    assert(loaded("utc") === fromLong)
    // unknown shapes fail loud, not silently mis-typed
    val weird = micros.toDF("ts")
      .select(col("ts").cast("string").as("ts"))
    intercept[IllegalStateException](Tables.normalizeEventsTs(weird))
  }

  test("core table columns the packs depend on are present with pinned types") {
    def f(name: String) = raw(name).schema
    val li = f("lineitem")
    assert(li("l_quantity").dataType == DoubleType, li.treeString)
    assert(li("l_shipdate").dataType == TimestampNTZType ||
      li("l_shipdate").dataType == TimestampType, li.treeString)
    val ord = f("orders")
    assert(ord("o_totalprice").dataType == DoubleType, ord.treeString)
    val doc = f("documents")
    assert(doc("doc_id").dataType == LongType, doc.treeString)
    assert(doc("text").dataType == StringType, doc.treeString)
    val emb = f("embeddings")
    assert(emb("vec_id").dataType == LongType, emb.treeString)
  }
}
