package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-group packs under `graft.operators`;
  * each pack pairs every query with its DuckDB oracle SQL (same column names,
  * same value semantics — see [[Ora]] for the double-determinism rules).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracle),
      (operators.Joins.queries, operators.Joins.oracle),
      (operators.Aggregates.queries, operators.Aggregates.oracle),
      (operators.Windows.queries, operators.Windows.oracle),
      (operators.SetOps.queries, operators.SetOps.oracle),
      (operators.Scalars.queries, operators.Scalars.oracle),
      (operators.TimeWindows.queries, operators.TimeWindows.oracle),
      (operators.AsOfJoin.queries, operators.AsOfJoin.oracle),
      (operators.Kv.queries, operators.Kv.oracle),
      (operators.Graph.queries, operators.Graph.oracle),
      (operators.Reshape.queries, operators.Reshape.oracle),
      (operators.Dedup.queries, operators.Dedup.oracle),
      (operators.Pipeline.queries, operators.Pipeline.oracle),
      (operators.Similarity.queries, operators.Similarity.oracle),
      (operators.KMeans.queries, operators.KMeans.oracle),
      (operators.Pq.queries, operators.Pq.oracle),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracle),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracle),
      (streaming.StreamingQueries.queries, streaming.StreamingQueries.oracle),
      (operators.Extensibility.queries, operators.Extensibility.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
