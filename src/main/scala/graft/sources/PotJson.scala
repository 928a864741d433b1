package graft.sources

import graft.kv.PotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

/** Migration-path source: read the reference's native storage format — one
  * `data.json` object per pot path holding a single JSON map
  * `{"<key>": {<document>}, ...}` (reference server.go:212-214,318-331;
  * readme.md:26-34) — into (key, document) rows.
  *
  * Scale shape: one pot object == one file == one task; a bucket with
  * thousands of pot paths ingests embarrassingly parallel (`path` accepts
  * globs over the per-path data.json objects). The two-level parse (file ->
  * key map -> typed doc) is all Catalyst `from_json`, no driver-side JSON.
  */
object PotJson {

  /** Read pot-style JSON file(s) into rows of (pot_file, key, doc json
    * string). Untyped form — use when document schemas vary per key.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .withColumn("pot_file", input_file_name())
      .select($"pot_file",
        explode(from_json($"value", MapType(StringType, StringType)))
          .as(Seq("key", "doc_json")))
  }

  /** Typed form: parse each document with the supplied schema (the
    * `Client[T]` equivalent — client-side schema, reference client.go:13-16).
    */
  def read(spark: SparkSession, path: String, docSchema: StructType): DataFrame = {
    import spark.implicits._
    readRaw(spark, path)
      .withColumn("doc", from_json($"doc_json", docSchema))
      .select($"pot_file", $"key", $"doc.*")
  }

  /** One-shot migration: ingest pot-format JSON into a [[PotTable]]
    * (versioned parquet with the CAS commit protocol). Returns the new
    * generation.
    */
  def migrate(
      spark: SparkSession, jsonPath: String, docSchema: StructType,
      root: String, potPath: String): Long = {
    val docs = read(spark, jsonPath, docSchema).drop("pot_file")
    PotTable(spark, root, potPath).upsert(docs)
  }

  /** The inverse migration: EXPORT a pot's current generation back to the
    * reference's native `data.json` shape — one JSON object mapping key →
    * document (server.go:212-214). Internal columns (underscore-prefixed,
    * e.g. `_modified`) are graft bookkeeping and stay out of the exported
    * documents. A pot is by definition ONE storage object in the reference
    * (the whole map is PUT atomically), so the single-string materialization
    * here is the format's own scale contract, not a Spark limitation —
    * unbounded tables belong in [[graft.kv.BucketedPotTable]], not a JSON
    * pot. Round-trip property: `migrate(export(pot))` reproduces the pot's
    * (key, doc) contents (PotJsonSpec).
    */
  def export(
      spark: SparkSession, root: String, potPath: String,
      outFile: String): Unit = {
    val df = PotTable(spark, root, potPath).get()
    val docCols = df.columns.filterNot(c => c == "key" || c.startsWith("_"))
    val json = df
      .agg(to_json(map_from_entries(collect_list(
        struct(col("key"), struct(docCols.map(col): _*))))).as("j"))
      .collect().head.getString(0)
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json)
  }
}
