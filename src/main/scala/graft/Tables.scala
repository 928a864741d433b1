package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One table == one parquet file under the scale-factor dir. This mirrors the
  * reference's "path -> single object" model (reference server.go:210-214) with
  * the object format swapped to parquet: at 100 TB each logical table becomes a
  * directory of parquet files and every loader below works unchanged, because
  * `spark.read.parquet` accepts files and directories alike.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog-metadata cache: file listing + schema inference happen once per
  // (session, path) instead of once per query — the fixtures are immutable,
  // and a real engine caches its catalog the same way. The DataFrame itself
  // is lazy; no data is pinned. Keyed by session IDENTITY (unlike a raw
  // identityHashCode key, a collision with a dead session can never hand a
  // new session a DataFrame bound to it). Entries are NOT GC-collectable —
  // a cached DataFrame strongly references its SparkSession through its
  // QueryExecution, so weak keys would not help — hence the explicit size
  // cap: past MaxSessions sessions the whole cache resets (it is purely
  // advisory; a fresh read just re-caches).
  private val MaxSessions = 16
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.IdentityHashMap[
      SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      if (cache.size > MaxSessions) cache.clear()
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        cache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(
      s"$dir/$name.parquet", spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet (TESTDATA/FIXTURES.md),
    * which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it
    * as raw nanos (legacy conf) and surface a microsecond TimestampType column
    * — the same ns->us truncation DuckDB applies, keeping oracle parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
