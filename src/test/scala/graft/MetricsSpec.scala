package graft

import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  import TestSpark._

  test("listener counts reads and writes like pot's op counters") {
    val m = Metrics.install(spark)
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-metrics").toString

    Seq((1, "a"), (2, "b")).toDF("k", "v").collect()              // read
    Seq((3, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$out/t")                 // write
    // QueryExecutionListener callbacks fire async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while ((m.reads.sum() < 1 || m.writes.sum() < 1) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)

    val snap = m.snapshot
    assert(snap("pot_reads") >= 1, snap.toString)
    assert(snap("pot_writes") >= 1, snap.toString)
    assert(snap("pot_failures") === 0, snap.toString)
  }
}
