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
    // long lease here: the lockout check below must not race Spark job latency
    val gen1 = pot.conditionalUpsert(
      Seq(("leader", "primary")).toDF("key", "owner"), leaseMs = 60000L)

    // secondary is locked out while the lease is live
    intercept[Throwable] {
      pot.conditionalUpsert(
        Seq(("leader", "secondary")).toDF("key", "owner"), leaseMs = 60000L)
    }

    // primary renews instantly through generation ownership (TestNoRewriteDuration);
    // the renewal shortens the lease so the expiry phase stays fast
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

  test("listPaths finds committed pots only, including nested paths (TestListPaths)") {
    val root = tmpRoot()
    assert(PotTable.listPaths(spark, root) === Seq.empty)
    PotTable(spark, root, "alpha").upsert(Seq(("k", 1)).toDF("key", "v"))
    PotTable(spark, root, "beta").upsert(Seq(("k", 2)).toDF("key", "v"))
    PotTable(spark, root, "locks/job").upsert(Seq(("k", 3)).toDF("key", "v"))
    new java.io.File(s"$root/not-a-pot").mkdirs()
    assert(PotTable.listPaths(spark, root) === Seq("alpha", "beta", "locks/job"))
  }

  test("double-crash wedge is diagnosable and repairable (repair)") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "t")
    pot.upsert(Seq(("a", 1)).toDF("key", "v"))
    // writer crashed between create and close (husk at gen 2), AND the
    // reclaimer that found it crashed after winning the reclaim file
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$root/t/_commits/2"), false).close()
    fs.create(new org.apache.hadoop.fs.Path(s"$root/t/_commits/2.reclaim"), false).close()

    val e = intercept[PotTable.CommitConflict] {
      pot.upsert(Seq(("b", 2)).toDF("key", "v"))
    }
    assert(e.getMessage.contains("repair"), e.getMessage)

    assert(pot.repair() === Seq(2L))
    pot.upsert(Seq(("b", 2)).toDF("key", "v"))
    assert(pot.generation === 2L)
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1, "b" -> 2))
  }

  test("crash husk between marker create and close: ignored, then reclaimed") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "t")
    pot.upsert(Seq(("a", 1)).toDF("key", "v"))
    // simulate a writer that died between fs.create(marker) and close():
    // a zero-length husk at the next generation
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$root/t/_commits/2"), false).close()

    // the husk is not a commit: readers and generation() ignore it
    assert(pot.generation === 1L)
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1))

    // the next writer reclaims the husk instead of being wedged forever
    pot.upsert(Seq(("b", 2)).toDF("key", "v"))
    assert(pot.generation === 2L)
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1, "b" -> 2))
  }

  test("vacuum keeps an in-flight writer's staged dir, drops lost races") {
    val root = tmpRoot()
    val pot = PotTable(spark, root, "t")
    pot.upsert(Seq(("a", 1)).toDF("key", "v"))
    // a concurrent writer has staged generation-2 data but not yet won the
    // CAS; a lost race left an unreferenced dir at the current generation
    val inFlight = new java.io.File(s"$root/t/data/g2_feedface")
    val lostRace = new java.io.File(s"$root/t/data/g1_deadbeef")
    Seq(inFlight, lostRace).foreach { d =>
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("part-0"), "x")
    }
    pot.vacuum(retainGenerations = 0)
    assert(inFlight.exists(), "vacuum deleted a not-yet-committed staging dir")
    assert(!lostRace.exists(), "vacuum kept an unreferenced lost-race dir")
    assert(pot.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1))
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

  test("snapshotAll bundles every pot at its current generation (A7 Zip)") {
    val root = tmpRoot()
    PotTable(spark, root, "alpha").upsert(Seq(("a", 1)).toDF("key", "v"))
    val beta = PotTable(spark, root, "beta")
    beta.upsert(Seq(("b", 1)).toDF("key", "v"))
    beta.upsert(Seq(("b", 2), ("c", 3)).toDF("key", "v")) // gen 2
    PotTable(spark, root, "nested/inner").upsert(Seq(("n", 9)).toDF("key", "v"))
    new java.io.File(s"$root/not-a-pot").mkdirs() // internal noise: excluded
    val out = s"$root/_bundle"
    val manifest = PotTable.snapshotAll(spark, root, out)
      .as[(String, Long)].collect().toMap
    assert(manifest === Map("alpha" -> 1L, "beta" -> 2L, "nested/inner" -> 1L))
    assert(spark.read.parquet(s"$out/nested/inner").count() === 1L)
    assert(spark.read.parquet(s"$out/alpha").count() === 1L)
    assert(spark.read.parquet(s"$out/beta").select("key").as[String]
      .collect().toSet === Set("b", "c"))
    // persisted manifest matches the returned one
    assert(spark.read.parquet(s"$out/_manifest").as[(String, Long)]
      .collect().toMap === manifest)
  }

  test("snapshotAll writes the reference bundle.tar.gz (A7 Zip format, server.go:550-614)") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val root = tmpRoot()
    PotTable(spark, root, "alpha").upsert(Seq(("a", 1)).toDF("key", "v"))
    PotTable(spark, root, "nested/inner").upsert(Seq(("n", 9)).toDF("key", "v"))
    val out = s"$root/_bundle"
    // a stray lock file in the export dir is excluded, like the reference
    // zip skips `.potlock` objects
    new java.io.File(out).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "stray.potlock"), "lock".getBytes)
    PotTable.snapshotAll(spark, root, out)

    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val expected = walk(new java.io.File(out))
      .map(f => new java.io.File(out).toPath.relativize(f.toPath).toString -> f)
      .filterNot { case (r, f) =>
        // .crc sidecars are Hadoop LocalFileSystem checksum artifacts the
        // FileSystem API hides (no analogue on an object store) — the raw
        // java.io walk sees them, the bundle correctly does not
        r == "bundle.tar.gz" || r.endsWith(".potlock") ||
          f.getName.startsWith(".")
      }.toMap
    assert(expected.keySet.exists(_.startsWith("alpha/")))
    assert(expected.keySet.exists(_.startsWith("nested/inner/")))
    assert(expected.keySet.exists(_.startsWith("_manifest/")))

    val tin = new TarArchiveInputStream(new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(s"$out/bundle.tar.gz")))
    val got = Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
      .map { e =>
        // mtimes pinned to epoch: identical trees => identical bundles
        assert(e.getLastModifiedDate.getTime === 0L,
          s"non-deterministic mtime on ${e.getName}")
        e.getName -> tin.readAllBytes()
      }.toMap
    tin.close()
    // every exported file is in the bundle, byte-identical; nothing extra
    assert(got.keySet === expected.keySet,
      s"extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    got.foreach { case (name, bytes) =>
      val disk = java.nio.file.Files.readAllBytes(expected(name).toPath)
      assert(java.util.Arrays.equals(bytes, disk), s"bundle entry $name differs from disk")
    }
  }

  test("restore rebuilds a cold warehouse from the bundle; snapshot isolation holds") {
    val root = tmpRoot()
    val alpha = PotTable(spark, root, "alpha")
    alpha.upsert(Seq(("a", 1), ("b", 2)).toDF("key", "v"))
    alpha.upsert(Seq(("b", 20)).toDF("key", "v")) // gen 2: LWW state
    PotTable(spark, root, "nested/inner").upsert(Seq(("n", 9)).toDF("key", "v"))
    val out = s"$root/_bundle"
    PotTable.snapshotAll(spark, root, out)
    // mutate the SOURCE after the snapshot: the restore must not see it
    alpha.upsert(Seq(("a", 999)).toDF("key", "v"))

    val root2 = tmpRoot()
    val manifest = PotTable.restore(spark, s"$out/bundle.tar.gz", root2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.keySet === Set("alpha", "nested/inner"))
    assert(manifest("alpha") === ((2L, 1L))) // source gen 2 -> restored gen 1
    // restored pots read through the normal commit protocol at gen 1
    val ra = PotTable(spark, root2, "alpha")
    assert(ra.generation === 1L)
    assert(ra.get().select("key", "v").as[(String, Int)].collect().toMap
      === Map("a" -> 1, "b" -> 20)) // snapshot-time state, not a=999
    assert(PotTable(spark, root2, "nested/inner").get()
      .select("key", "v").as[(String, Int)].collect().toMap === Map("n" -> 9))
  }

  test("key derivation casts non-string id/name where the reference panics (server.go:349-353)") {
    import graft.operators.Kv
    // Numeric id: the reference's bare `.(string)` assertion panics here;
    // graft's documented deviation (SURVEY 7.4) casts to the string form.
    val numeric = Kv.deriveKeys(Seq((7, "seven"), (8, "eight")).toDF("id", "name"))
    assert(numeric.select("key").as[String].collect().toSet === Set("7", "8"))
    // id wins over name when both present (server.go:347-354)
    val both = Kv.deriveKeys(Seq(("i1", "n1")).toDF("id", "name"))
    assert(both.select("key").as[String].collect().toSeq === Seq("i1"))
    // name-only falls back; null id behaves as absent
    val fallback = Kv.deriveKeys(
      Seq((null: String, "n2")).toDF("id", "name"))
    assert(fallback.select("key").as[String].collect().toSeq === Seq("n2"))
    // Neither field: the reference files the doc under key "" — graft's
    // second documented deviation drops it (empty key can't be addressed).
    val keyless = Kv.deriveKeys(Seq(Tuple1("payload")).toDF("other"))
    assert(keyless.count() === 0L)
    // explicit empty-string id is equally unaddressable: same drop
    val emptyId = Kv.deriveKeys(Seq(("", "")).toDF("id", "name"))
    assert(emptyId.count() === 0L)
  }

  test("norewrite duration parse falls back silently to 0 on a bad value (server_routes.go:86-93)") {
    import graft.kv.PotClient
    // the reference's time.ParseDuration forms
    assert(PotClient.parseNoRewriteMs("10s") === 10000L)
    assert(PotClient.parseNoRewriteMs("300ms") === 300L)
    assert(PotClient.parseNoRewriteMs("1m30s") === 90000L)
    assert(PotClient.parseNoRewriteMs("1.5h") === 5400000L)
    assert(PotClient.parseNoRewriteMs("0") === 0L)
    assert(PotClient.parseNoRewriteMs("1500μs") === 1L) // Greek mu, Go-valid
    assert(PotClient.parseNoRewriteMs("1.h") === 3600000L) // bare dot, Go-valid
    assert(PotClient.parseNoRewriteMs(".5s") === 500L)
    // unparsable -> 0, silently (the reference's err != nil branch)
    assert(PotClient.parseNoRewriteMs("garbage") === 0L)
    assert(PotClient.parseNoRewriteMs("10 seconds") === 0L)
    assert(PotClient.parseNoRewriteMs("") === 0L)
    assert(PotClient.parseNoRewriteMs("12") === 0L) // bare number: no unit
    assert(PotClient.parseNoRewriteMs("+-10s") === 0L) // one sign max, like Go
    // int64-ns overflow is a Go parse error -> same fallback 0
    assert(PotClient.parseNoRewriteMs("99999999999999999h") === 0L)
    // exact boundary: 2^63 ns is the FIRST overflowing value. Double
    // accumulation rounds it to exactly Long.MaxValue.toDouble, so the
    // overflow check must be >= (with > it returned a nonzero window).
    assert(PotClient.parseNoRewriteMs("9223372036854775808ns") === 0L)
    // one ulp below stays a valid parse (Go: 9223372036854775807ns is MaxInt64)
    assert(PotClient.parseNoRewriteMs("9223372036854775000ns") === 9223372036854L)
    // behavioral consequence: a client built with a bad duration has NO
    // no-rewrite window, so a second client can immediately take the path
    val root = tmpRoot()
    val c1 = PotClient(spark, root, "garbage")
    c1.create("locks/job", Seq(("leader", "c1")).toDF("key", "owner"))
    val c2 = PotClient(spark, root, "garbage")
    c2.create("locks/job", Seq(("leader", "c2")).toDF("key", "owner"))
    assert(c2.get("locks/job").select("owner").as[String]
      .collect().toSeq === Seq("c2"))
  }

  test("publish reports own write/close failure as retryable CommitIncomplete, not foreign conflict") {
    import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path, RawLocalFileSystem}
    val root = tmpRoot()
    // scheme-less path: resolvable by the mock-scheme FS below AND by the
    // local-FS semantics underneath it
    val marker = new Path(s"$root/commits/1")
    // a RawLocalFileSystem whose next create() returns a stream that fails
    // at close — the injected "writer dies between create and close".
    // Claims a non-file scheme so publish takes the create-then-write path
    // (the REAL file: path link-publishes atomically since r11 and cannot
    // hit this failure mode at all — that atomicity has its own spec in
    // BucketedPotSpec).
    val fs = new RawLocalFileSystem() {
      override def getUri: java.net.URI = new java.net.URI("mockdfs:///")
      var failNextClose = true
      override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
        val real = super.create(f, overwrite)
        if (!failNextClose) real
        else {
          failNextClose = false
          new FSDataOutputStream(new java.io.FilterOutputStream(real) {
            override def close(): Unit = {
              real.close()
              throw new java.io.IOException("injected close failure")
            }
          }, null)
        }
      }
    }
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    // no other writer exists, so this failure is OURS: the old code
    // reported "already committed by another writer" here
    val e = intercept[PotTable.CommitIncomplete](
      graft.kv.CommitMarker.publish(fs, marker, "body-of-writer-1"))
    assert(e.getMessage.contains("retry"))
    // the failed attempt's husk was cleaned: no zero-length marker remains
    assert(!fs.exists(marker), "failed-commit husk left behind")
    // and a straight retry succeeds with a durable read-back
    graft.kv.CommitMarker.publish(fs, marker, "body-of-writer-1")
    assert(graft.kv.CommitMarker.read(fs, marker) === "body-of-writer-1")
  }

  test("auto-snapshot client re-exports the warehouse after every write (A7 trigger)") {
    import graft.kv.PotClient
    val root = tmpRoot()
    val snaps = s"$root/_snaps"
    val c = PotClient.withAutoSnapshot(spark, root, leaseMs = 60000L, snaps)
    c.upsert("alpha", Seq(("a", 1)).toDF("key", "v"))
    c.upsert("beta", Seq(("b", 1)).toDF("key", "v"))
    c.remove("alpha", Seq("a"))
    assert(c.snapshotCount === 3L)
    // N writes -> N immutable snapshot dirs, each with a manifest
    val dirs = new java.io.File(snaps).listFiles()
      .filter(_.getName.startsWith("snap-")).map(_.getName).toSet
    assert(dirs === Set("snap-1", "snap-2", "snap-3"))
    (1 to 3).foreach { n =>
      assert(new java.io.File(s"$snaps/snap-$n/_manifest").exists(),
        s"snap-$n has no manifest")
    }
    // each snapshot captured the state at its trigger point
    val m1 = spark.read.parquet(s"$snaps/snap-1/_manifest")
      .as[(String, Long)].collect().toMap
    assert(m1 === Map("alpha" -> 1L))
    val m3 = spark.read.parquet(s"$snaps/snap-3/_manifest")
      .as[(String, Long)].collect().toMap
    assert(m3 === Map("alpha" -> 2L, "beta" -> 1L))
    // reads never trigger
    c.get("beta").count()
    assert(c.snapshotCount === 3L)
  }

  test("client generation cache: immediate self-rewrites ok, others locked out (TestNoRewriteDuration)") {
    import graft.kv.PotClient
    val root = tmpRoot()
    val c1 = PotClient(spark, root, leaseMs = 60000L)
    // three immediate no-rewrite creates from the same client, well inside
    // the lease window — succeed via transparent generation replay
    c1.create("locks/job", Seq(("leader", "c1-a")).toDF("key", "owner"))
    c1.create("locks/job", Seq(("leader", "c1-b")).toDF("key", "owner"))
    val gen3 = c1.create("locks/job", Seq(("leader", "c1-c")).toDF("key", "owner"))
    assert(gen3 === 3L)
    assert(c1.ownedGeneration("locks/job") === Some(3L))

    // a second client holds no generation: locked out while the lease lives
    val c2 = PotClient(spark, root, leaseMs = 60000L)
    intercept[PotTable.CommitConflict] {
      c2.create("locks/job", Seq(("leader", "c2")).toDF("key", "owner"))
    }
    assert(c1.get("locks/job").select("owner").as[String].collect().head === "c1-c")

    // reads never grant ownership (cache is fed by writes only)
    c2.get("locks/job")
    intercept[PotTable.CommitConflict] {
      c2.create("locks/job", Seq(("leader", "c2")).toDF("key", "owner"))
    }
  }

  test("PotTxn: prepare (crash before apply) leaves nothing visible; recover rolls forward atomically") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-txn1").toString
    val txn = new graft.kv.PotTxn(spark, root)
    val n = txn.prepare(Seq(
      "pa" -> Seq(("k1", 1)).toDF("key", "v"),
      "pb" -> Seq(("k2", 2)).toDF("key", "v")))
    // commit point durable, apply never ran: both pots still empty
    assert(PotTable(spark, root, "pa").generation === 0L)
    assert(PotTable(spark, root, "pb").generation === 0L)
    assert(txn.recover() === Seq(n))
    assert(PotTable(spark, root, "pa").get().select("v").as[Int].collect().toSeq === Seq(1))
    assert(PotTable(spark, root, "pb").get().select("v").as[Int].collect().toSeq === Seq(2))
    // second recover: nothing pending
    assert(txn.recover() === Seq.empty)
  }

  test("PotTxn: gcBelow drops old frontiers; reads below the watermark fail loudly, at/above stay exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-txngc").toString
    val txn = new graft.kv.PotTxn(spark, root)
    val t1 = txn.commitAll(Seq(
      "pa" -> Seq(("k1", 1)).toDF("key", "v"),
      "pb" -> Seq(("k2", 1)).toDF("key", "v")))
    val t2 = txn.commitAll(Seq(
      "pa" -> Seq(("k1", 2)).toDF("key", "v"),
      "pb" -> Seq(("k2", 2)).toDF("key", "v")))
    val f1 = txn.frontier(t1)
    val f2 = txn.frontier(t2)
    // GC below t2: t1's applied markers and stage go away; the watermark
    // marker checkpoints frontier(t2) so later reads stay exact
    txn.gcBelow(t2)
    assert(txn.gcWatermark === t2)
    val e = intercept[graft.kv.PotTable.RetentionViolated] {
      txn.snapshotAt(t1)
    }
    assert(e.getMessage.contains("watermark"), e.getMessage)
    // at/above the watermark: frontier identical to pre-GC, snapshot exact
    assert(txn.frontier(t2) === f2,
      "checkpointed frontier diverged from the pre-GC frontier")
    val snap = txn.snapshotAt(t2)
    assert(snap("pa").select($"v").as[Int].collect().toSeq === Seq(2))
    assert(snap("pb").select($"v").as[Int].collect().toSeq === Seq(2))
    // a THIRD txn on top of the checkpoint: frontier folds checkpoint +
    // post-watermark markers; pots not in t3 keep their checkpointed gen
    val t3 = txn.commitAll(Seq("pa" -> Seq(("k1", 3)).toDF("key", "v")))
    val f3 = txn.frontier(t3)
    assert(f3("pb") === f2("pb"), "checkpoint seed lost pb's coordinate")
    assert(txn.snapshotAt(t3)("pa").select($"v").as[Int].collect().toSeq
      === Seq(3))
    // the watermark only moves forward
    intercept[IllegalArgumentException] { txn.gcBelow(t1) }
    // ...and never PAST the committed txn head: a future txn would be
    // numbered at or below the watermark and frontier()'s `t > w` filter
    // would silently drop its applied coordinates forever
    val eAhead = intercept[IllegalArgumentException] { txn.gcBelow(t3 + 5) }
    assert(eAhead.getMessage.contains("head"), eAhead.getMessage)
    // the guard really protects visibility: commit t4, gc at the head,
    // and t4's coordinates survive in every later frontier
    val t4 = txn.commitAll(Seq("pb" -> Seq(("k2", 4)).toDF("key", "v")))
    txn.gcBelow(t4)
    assert(txn.frontier(t4)("pb") > f2("pb"),
      "post-GC frontier lost a committed txn's coordinate")
    // and a pot generation dropped by PotTable.vacuum is equally loud
    val pa = PotTable(spark, root, "pa")
    pa.vacuum(retainGenerations = 0)
    val e2 = intercept[graft.kv.PotTable.RetentionViolated] {
      pa.getAt(f2("pa")).collect()
    }
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
    assert(f1 !== f2) // the GC'd frontier really was distinct state
  }

  test("PotTxn: apply rebases over a concurrent single-pot commit instead of clobbering") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-txn2").toString
    val txn = new graft.kv.PotTxn(spark, root)
    txn.commitAll(Seq("px" -> Seq(("k1", 1)).toDF("key", "v")))
    // a direct writer moves the head between commit point and apply
    PotTable(spark, root, "px").upsert(Seq(("k2", 2)).toDF("key", "v"))
    val n2 = txn.prepare(Seq("px" -> Seq(("k1", 10)).toDF("key", "v")))
    txn.recover()
    val state = PotTable(spark, root, "px").get()
      .select("key", "v").as[(String, Int)].collect().toMap
    assert(state === Map("k1" -> 10, "k2" -> 2), s"txn $n2 lost an update: $state")
  }

  test("PotTxn: applyTxn is at-least-once idempotent (racing recoverers safe)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-txn3").toString
    val txn = new graft.kv.PotTxn(spark, root)
    val n = txn.commitAll(Seq("pi" -> Seq(("k", 7)).toDF("key", "v")))
    val before = PotTable(spark, root, "pi").get()
      .select("key", "v").as[(String, Int)].collect().toSeq
    txn.applyTxn(n) // replay the whole txn — applied markers short-circuit
    val after = PotTable(spark, root, "pi").get()
      .select("key", "v").as[(String, Int)].collect().toSeq
    assert(after === before)
    assert(PotTable(spark, root, "pi").generation === 1L)
  }

  test("PotTxn: crash between per-pot applied markers + concurrent writers — recovery replays exactly the unfinished suffix") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = java.nio.file.Files.createTempDirectory("graft-txn4").toString
    val txn = new graft.kv.PotTxn(spark, root)
    val n = txn.prepare(Seq(
      "pa" -> Seq(("t1", 1)).toDF("key", "v"),
      "pb" -> Seq(("t2", 2)).toDF("key", "v"),
      "pc" -> Seq(("t3", 3)).toDF("key", "v")))
    // Simulate the coordinator dying BETWEEN per-pot applied markers: pa
    // fully applied (upsert + applied marker), pb/pc untouched — the one
    // crash quadrant prepare-crash/rebase/idempotent-replay didn't cover.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    PotTable(spark, root, "pa").upsert(Seq(("t1", 1)).toDF("key", "v"))
    val done = new org.apache.hadoop.fs.Path(s"$root/_txns/applied/$n/pa")
    fs.mkdirs(done.getParent)
    graft.kv.CommitMarker.publish(fs, done, "done")
    val paGen = PotTable(spark, root, "pa").generation
    // Six independent writers land generations on pb between the commit
    // point and recovery AND while recovery's rebase loop is running —
    // the BucketedPotSpec stress shape applied to the txn coordinator.
    val writers = (1 to 6).map { w =>
      Future(scala.util.Try {
        var ok = false
        while (!ok) {
          try {
            PotTable(spark, root, "pb")
              .upsert(Seq((s"w$w", w * 100)).toDF("key", "v"))
            ok = true
          } catch { case _: PotTable.CommitConflict => () }
        }
      })
    }
    val recovered = Await.result(Future(txn.recover()), 180.seconds)
    writers.foreach(f => assert(Await.result(f, 180.seconds).isSuccess))
    assert(recovered === Seq(n))
    // pa's applied marker short-circuited: NOT re-applied, generation intact
    assert(PotTable(spark, root, "pa").generation === paGen,
      "recovery re-applied an already-marked pot")
    // pb: the txn row AND every concurrent writer's generation survive —
    // the rebase loop re-reads the head on each conflict, never clobbers
    val pb = PotTable(spark, root, "pb").get()
      .select($"key", $"v").as[(String, Int)].collect().toMap
    assert(pb.get("t2").contains(2), s"txn row lost on pb: $pb")
    (1 to 6).foreach(w =>
      assert(pb.get(s"w$w").contains(w * 100), s"writer $w lost: $pb"))
    // pc (never started): rolled forward
    assert(PotTable(spark, root, "pc").get()
      .select($"key", $"v").as[(String, Int)].collect().toSeq === Seq(("t3", 3)))
    assert(txn.recover() === Seq.empty)
  }

  test("IndexedPot: postings track value moves; emptied values overwrite to []") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ix1").toString
    val ip = new graft.kv.IndexedPot(spark, root, "t")
    ip.upsert(Seq(("a", "red", 1), ("b", "red", 2), ("c", "blue", 3))
      .toDF("key", "fval", "v"))
    assert(ip.lookup("red").select("key").as[String].collect().sorted
      === Array("a", "b"))
    // move every red key away: red's posting must overwrite to empty
    ip.upsert(Seq(("a", "green", 1), ("b", "blue", 2)).toDF("key", "fval", "v"))
    assert(ip.lookup("red").count() === 0L)
    assert(ip.lookup("blue").select("key").as[String].collect().sorted
      === Array("b", "c"))
    assert(ip.lookup("green").select("key").as[String].collect() === Array("a"))
    val redPosting = ip.idxPot.get().filter($"key" === "red")
      .select("keys").as[Seq[String]].collect()
    assert(redPosting === Array(Seq.empty[String]), "empty posting row expected")
  }

  test("IndexedPot: a committed txn interrupted before apply recovers index-consistent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ix2").toString
    val ip = new graft.kv.IndexedPot(spark, root, "t")
    ip.upsert(Seq(("a", "red", 1)).toDF("key", "fval", "v"))
    // simulate the crash window: stage+commit-point a second batch but die
    // before apply — IndexedPot's writes go through the same txn root
    val txn = new graft.kv.PotTxn(spark, root)
    txn.prepare(Seq(
      "t-data" -> Seq(("b", "red", 2)).toDF("key", "fval", "v"),
      "t-idx" -> Seq(("red", Seq("a", "b"))).toDF("key", "keys")))
    assert(ip.lookup("red").count() === 1L, "crash window: txn not applied yet")
    txn.recover()
    assert(ip.lookup("red").select("key").as[String].collect().sorted
      === Array("a", "b"), "roll-forward must land data AND index")
  }

  test("upsert evolves schema: widen backfills null, narrow LWW drops the field, old gens keep their shape") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-evo").toString
    val pot = graft.kv.PotTable(spark, root, "evo")
    pot.upsert(Seq(("a", 1), ("b", 2)).toDF("key", "v"))
    // gen 2 introduces column w — untouched row "b" must read null there
    pot.upsert(Seq(("a", 10, "x")).toDF("key", "v", "w"))
    val g2 = pot.get().select($"key", $"v", $"w").as[(String, Int, Option[String])]
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(g2 === Map("a" -> ((10, Some("x"))), "b" -> ((2, None))))
    // gen 3 re-writes "a" with the narrow shape: whole-document LWW, so
    // its w reverts to null (pot docs replace, never column-merge)
    pot.upsert(Seq(("a", 100)).toDF("key", "v"))
    val g3 = pot.get().select($"key", $"v", $"w").as[(String, Int, Option[String])]
      .collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    assert(g3 === Map("a" -> ((100, None)), "b" -> ((2, None))))
    // time travel: generation 1 still has the narrow schema
    assert(!pot.getAt(1L).schema.fieldNames.contains("w"))
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
  }

  test("replace == upsert for a batch covering every surviving key (r20 fast path)") {
    import spark.implicits._
    def state(p: graft.kv.PotTable) = p.get()
      .select($"key", $"n").as[(String, Long)].collect().toMap
    val rootA = java.nio.file.Files.createTempDirectory("graft-repl-a").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-repl-b").toString
    val a = graft.kv.PotTable(spark, rootA, "c")
    val b = graft.kv.PotTable(spark, rootB, "c")
    val w1 = Seq(("k1", 1L), ("k2", 2L)).toDF("key", "n")
    a.upsert(w1); b.upsert(w1)
    // the additive-counter shape: the next batch contains EVERY key
    val w2 = Seq(("k1", 5L), ("k2", 2L), ("k3", 7L)).toDF("key", "n")
    a.upsert(w2)
    b.replace(w2)
    assert(state(a) === state(b), "replace diverged from upsert on a covering batch")
    assert(a.generation === b.generation, "replace burned a different generation count")
    // and replace IS a replace: a key absent from the batch is dropped
    b.replace(Seq(("k1", 9L)).toDF("key", "n"))
    assert(state(b) === Map("k1" -> 9L))
    Seq(rootA, rootB).foreach(p =>
      new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
  }
}
