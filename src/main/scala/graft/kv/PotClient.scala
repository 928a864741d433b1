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
  */
final class PotClient(spark: SparkSession, root: String, leaseMs: Long) {

  private val ownedPathGenerations =
    scala.collection.concurrent.TrieMap.empty[String, Long]

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
    gen
  }

  /** Unconditional upsert (reference Create without norewrite — LWW merge).
    * Also records the generation: any successful write grants ownership.
    */
  def upsert(path: String, docs: Dataset[_]): Long = {
    val gen = table(path).upsert(docs.toDF())
    ownedPathGenerations(path) = gen
    gen
  }

  /** Multi-key delete; like the reference Remove, does NOT update the cache
    * (no generation in the response) — a later no-rewrite create replays a
    * stale generation and falls back to the lease check.
    */
  def remove(path: String, keys: Seq[String]): Long = table(path).remove(keys)

  def get(path: String): DataFrame = table(path).get()

  /** Typed read, mirroring the Go client's `Client[T]` decode. */
  def getAs[T: Encoder](path: String): Dataset[T] = get(path).as[T]
}

object PotClient {
  def apply(spark: SparkSession, root: String, leaseMs: Long): PotClient =
    new PotClient(spark, root, leaseMs)
}
