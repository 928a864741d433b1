package graft

import graft.kv.PotTable
import org.scalatest.funsuite.AnyFunSuite

/** Pot-parity semantics tests modeled on the reference's own e2e scenarios
  * (client_test.go: TestFlow, TestElection, TestReElection,
  * TestNoRewriteDuration — SURVEY.md §5).
  */
class KvSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-kv").toString

  test("CRUD roundtrip: upsert / get / re-upsert LWW / remove (TestFlow)") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "t")
    assert(pot.generation === 0L)
    assert(pot.get().isEmpty)

    pot.upsert(Seq(("a", 1), ("b", 2)).toDF("key", "v"))
    assert(pot.generation === 1L)
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1, "b" -> 2))

    // last-writer-wins on key collision; new key merged in
    pot.upsert(Seq(("a", 10), ("c", 3)).toDF("key", "v"))
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 10, "b" -> 2, "c" -> 3))

    // multi-key delete; absent key is a no-op
    pot.remove(Seq("a", "zzz"))
    assert(pot.get().select("key").as[String].collect().toSet === Set("b", "c"))
    assert(pot.generation === 3L)
  }

  test("election: N racing conditional writers, exactly one wins (TestElection)") {
    val root = tmpRoot()
    val contenders = (1 to 5).map(i => s"node-$i")
    val results = contenders.map { node =>
      val pot = PotTable(spark, root, "leader")
      try {
        pot.conditionalUpsert(
          Seq(("leader", node)).toDF("key", "owner"), leaseMs = 60000L)
        node -> true
      } catch { case _: Throwable => node -> false }
    }
    assert(results.count(_._2) === 1, s"expected exactly 1 winner: $results")
    val winner = results.find(_._2).get._1
    val stored = PotTable(spark, root, "leader").get()
      .select("owner").as[String].collect().head
    assert(stored === winner)
  }

  test("re-election: owner renews via generation; lease expiry allows takeover (TestReElection)") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "leader")
    val gen1 = pot.conditionalUpsert(
      Seq(("leader", "primary")).toDF("key", "owner"), leaseMs = 500L)

    // secondary is locked out while the lease is live
    intercept[Throwable] {
      pot.conditionalUpsert(
        Seq(("leader", "secondary")).toDF("key", "owner"), leaseMs = 500L)
    }

    // primary renews instantly through generation ownership (TestNoRewriteDuration)
    val gen2 = pot.conditionalUpsert(
      Seq(("leader", "primary")).toDF("key", "owner"), leaseMs = 500L,
      callerGeneration = gen1)
    assert(gen2 === gen1 + 1)

    // after the lease expires, secondary takes over without the generation
    Thread.sleep(700L)
    val gen3 = pot.conditionalUpsert(
      Seq(("leader", "secondary")).toDF("key", "owner"), leaseMs = 500L)
    assert(gen3 === gen2 + 1)
    assert(pot.get().select("owner").as[String].collect().head === "secondary")
  }

  test("listPaths finds committed pots only (TestListPaths)") {
    val root = tmpRoot()
    assert(PotTable.listPaths(spark, root) === Seq.empty)
    PotTable(spark, root, "alpha").upsert(Seq(("k", 1)).toDF("key", "v"))
    PotTable(spark, root, "beta").upsert(Seq(("k", 2)).toDF("key", "v"))
    new java.io.File(s"$root/not-a-pot").mkdirs()
    assert(PotTable.listPaths(spark, root) === Seq("alpha", "beta"))
  }

  test("snapshot exports current version and reports manifest (A7)") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "t")
    pot.upsert(Seq(("a", 1), ("b", 2)).toDF("key", "v"))
    val manifest = pot.snapshot(s"$root/_export")
    assert(manifest.select("generation").as[Long].collect().head === 1L)
    val exported = spark.read.parquet(s"$root/_export/t")
    assert(exported.count() === 2L)
  }
}
