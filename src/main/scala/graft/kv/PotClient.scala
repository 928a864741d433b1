package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Client facade with the reference Go client's per-path generation cache
  * (A11 parity): every successful WRITE records the returned generation in
  * `ownedPathGenerations` (reference client.go:148-152), and no-rewrite
  * creates transparently replay it (client.go:115-120) to prove ownership.
  * So a client that just wrote a path can immediately rewrite it without
  * waiting out the lease — the mechanism behind TestNoRewriteDuration
  * (client_test.go:319-339) — while OTHER clients, holding no generation,
  * stay locked out until the lease expires.
  *
  * Like the reference, the cache is fed by writes only (reads and removes
  * never grant ownership), and a stale entry simply fails the replay — the
  * server-side lease check in [[PotTable.conditionalUpsert]] remains the
  * source of truth.
  *
  * A7 per-write trigger parity: when `autoSnapshotDir` is set, every
  * successful write (create/upsert/remove) re-exports the WHOLE warehouse
  * — the reference re-zips the entire bucket after each write when `-zip`
  * is on (server_routes.go:121-125,160-166, server.go:550-614). Each
  * trigger lands in its own `snap-<n>` subdir (the object-store-friendly
  * form of the reference's overwrite-in-place bundle.tar.gz: immutable,
  * so a reader mid-download never sees a torn bundle), with the manifest
  * at `snap-<n>/_manifest`. Like the reference's synchronous triggerZip,
  * the export cost is per-write by design — the knob exists for
  * OPA-bundle-style consumers, not the hot path.
  */
final class PotClient(spark: SparkSession, root: String, leaseMs: Long,
    autoSnapshotDir: Option[String] = None) {

  private val ownedPathGenerations =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  private val snapSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Number of auto-snapshots taken so far — test/debug hook. */
  def snapshotCount: Long = snapSeq.get()

  private def triggerSnapshot(): Unit = autoSnapshotDir.foreach { dir =>
    val n = snapSeq.incrementAndGet()
    PotTable.snapshotAll(spark, root, s"$dir/snap-$n")
  }

  private def table(path: String): PotTable = PotTable(spark, root, path)

  /** Generation this client owns for `path`, if any — test/debug hook. */
  def ownedGeneration(path: String): Option[Long] = ownedPathGenerations.get(path)

  /** No-rewrite create (reference Create + WithNoRewrite): rejected while
    * another writer's lease is live, unless this client's cached generation
    * proves ownership. Records the new generation on success.
    */
  def create(path: String, docs: Dataset[_]): Long = {
    val gen = table(path).conditionalUpsert(docs.toDF(), leaseMs,
      ownedPathGenerations.getOrElse(path, -1L))
    ownedPathGenerations(path) = gen
    triggerSnapshot()
    gen
  }

  /** Unconditional upsert (reference Create without norewrite — LWW merge).
    * Also records the generation: any successful write grants ownership.
    */
  def upsert(path: String, docs: Dataset[_]): Long = {
    val gen = table(path).upsert(docs.toDF())
    ownedPathGenerations(path) = gen
    triggerSnapshot()
    gen
  }

  /** Multi-key delete; like the reference Remove, does NOT update the cache
    * (no generation in the response) — a later no-rewrite create replays a
    * stale generation and falls back to the lease check.
    */
  def remove(path: String, keys: Seq[String]): Long = {
    val gen = table(path).remove(keys)
    triggerSnapshot()
    gen
  }

  def get(path: String): DataFrame = table(path).get()

  /** Typed read, mirroring the Go client's `Client[T]` decode. */
  def getAs[T: Encoder](path: String): Dataset[T] = get(path).as[T]
}

object PotClient {
  def apply(spark: SparkSession, root: String, leaseMs: Long): PotClient =
    new PotClient(spark, root, leaseMs)

  /** Client configured with a Go-style no-rewrite duration STRING — the
    * HTTP surface's option-parsing semantics ([[parseNoRewriteMs]]).
    */
  def apply(spark: SparkSession, root: String, lease: String): PotClient =
    new PotClient(spark, root, parseNoRewriteMs(lease))

  // Go number forms: "1", "1.", ".5", "1.5" — at least one digit somewhere
  private val DurTok =
    "([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)(ns|us|µs|μs|ms|s|m|h)".r

  /** Parse a Go `time.ParseDuration`-style string ("300ms", "10s",
    * "1m30s", "1.5h") to milliseconds, with the reference HTTP surface's
    * fallback semantics (server_routes.go:86-93): an UNPARSABLE duration
    * silently becomes 0 — no error, the write proceeds with no no-rewrite
    * window — rather than rejecting the request. Go details mirrored: at
    * most ONE leading sign, both micro signs (U+00B5 and U+03BC) accepted,
    * and an int64-nanosecond overflow is a parse ERROR — which here means
    * the same silent 0. Deliberate parity with that deviation-prone
    * behavior; asserted in KvSpec.
    */
  def parseNoRewriteMs(s: String): Long = {
    val (neg, body) =
      if (s.startsWith("-")) (true, s.substring(1))
      else if (s.startsWith("+")) (false, s.substring(1))
      else (false, s)
    if (body == "0") return 0L
    val toks = DurTok.findAllMatchIn(body).toSeq
    if (toks.isEmpty || toks.map(_.matched).mkString != body) return 0L
    val unitMs = Map("ns" -> 1e-6, "us" -> 1e-3, "µs" -> 1e-3, "μs" -> 1e-3,
      "ms" -> 1.0, "s" -> 1000.0, "m" -> 60000.0, "h" -> 3600000.0)
    val total = toks.map(m => m.group(1).toDouble * unitMs(m.group(2))).sum
    // Go errors when the duration overflows int64 nanoseconds; the HTTP
    // surface's err-branch turns that into the same fallback 0. The check is
    // `>=` against 2^63 because Long.MaxValue.toDouble rounds UP to exactly
    // 2^63: with `>` the first overflowing value ("9223372036854775808ns")
    // would slip through. Double accumulation is a one-ulp approximation of
    // Go's exact integer parse near the boundary (magnitudes within ~512 ns
    // of 2^63 can land on either side); documented + asserted in KvSpec.
    if (total * 1e6 >= Long.MaxValue.toDouble) return 0L
    val signed = if (neg) -total else total
    signed.toLong
  }

  /** Client with the per-write whole-warehouse snapshot trigger enabled. */
  def withAutoSnapshot(spark: SparkSession, root: String, leaseMs: Long,
      snapshotDir: String): PotClient =
    new PotClient(spark, root, leaseMs, Some(snapshotDir))
}
