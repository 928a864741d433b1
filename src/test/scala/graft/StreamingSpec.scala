package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming transforms driven synchronously via MemoryStream. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("tumbling streaming counts match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(2), 10, "click", 2.0),
      Event(3, ts(20), 11, "view", 3.0))
    val q = EventStreams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select("event_type", "n").as[(String, Long)].collect().toMap
      assert(rows === Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(1, ts(1), 10, "click", 1.0), // exact replay
      Event(2, ts(2), 10, "view", 2.0))
    val q = EventStreams.dedupeEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2L)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.5),
      Event(2, ts(2), 10, "click", 2.5),
      Event(3, ts(3), 11, "view", 10.0))
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("running_out")
        .select("user_id", "n_events", "total")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.last).toMap
      assert(rows(10L) === ((10L, 2L, 4.0)))
      assert(rows(11L) === ((11L, 1L, 10.0)))
    } finally q.stop()
  }

  test("streaming writes to a real parquet file sink with checkpointing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(2), 11, "view", 2.0))
    val q = EventStreams.dedupeEvents(mem.toDF())
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/out").count() === 2L)
    } finally q.stop()
  }

  test("st1/st2 leave no temp state behind across repeated invocations") {
    import graft.streaming.StreamingQueries
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def st1Dirs = tmp.listFiles().count(_.getName.startsWith("graft-st1"))
    def st2Views = spark.catalog.listTables().collect()
      .count(t => t.name.startsWith("st2_") || t.name.startsWith("st3_"))
    // delta-based: stale dirs from earlier (pre-fix) sessions may exist
    val dirs0 = st1Dirs
    val views0 = st2Views
    val r1 = StreamingQueries.streamDedup(spark, sf).count()
    val r2 = StreamingQueries.streamDedup(spark, sf).count()
    assert(r1 === r2)
    assert(st1Dirs === dirs0, "st1 sink/checkpoint temp dirs not cleaned up")
    val t1 = StreamingQueries.streamTumbling(spark, sf).count()
    val t2 = StreamingQueries.streamTumbling(spark, sf).count()
    assert(t1 === t2)
    StreamingQueries.streamEnriched(spark, sf).count()
    assert(st2Views === views0, "st2/st3 memory-sink temp views not dropped")
  }

  test("session windows close after the gap (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(5), 10, "click", 1.0),  // same session (gap < 30m)
      Event(3, ts(50), 10, "click", 1.0)) // new session
    // session aggregation requires Append mode: rows emit once the watermark
    // passes the session end, so push a late flush event in a second batch
    val q = EventStreams.userSessions(mem.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      mem.addData(Event(99, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"),
        99, "flush", 0.0))
      q.processAllAvailable()
      val n = spark.table("sessions_out").count()
      assert(n >= 2L, s"expected >=2 closed sessions, got $n")
    } finally q.stop()
  }
}
