package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline composites over `documents` — the end-to-end
  * shapes a 100 TB corpus-prep run is made of, each one oracle-checked:
  *
  *   - p1: quality gate + exact-dedup keep-first → the cleaned corpus;
  *   - p2: deterministic per-language stratified sampling (hash-bernoulli —
  *     no RNG state, reproducible on any cluster layout, mirrors exactly in
  *     SQL as a lexical compare on an md5 prefix);
  *   - p3: token-budget packing: concatenate per language in doc_id order,
  *     chunk at a fixed token budget — the standard pretraining packing
  *     shape, expressed as a running-sum window + integer division, so it
  *     is exact in both engines.
  *
  * Scale shapes: p1/p2 are scan-projections plus one window keyed by a
  * real column (fp / nothing); p3 is one window per language partition — at
  * 100 TB the packing key would gain a date/shard component exactly like
  * q18's halo'd splits, but the operator shape is unchanged.
  */
object Pipeline {

  /** p1: cleaned corpus = docs passing the quality gates, keeping the
    * lowest doc_id among byte-identical duplicates (d1's dedup applied as a
    * filter). Gates: 30..4000 words, no empty text, letters present.
    */
  def corpusFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"fp").orderBy($"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("n_words", size(split($"text", " ")))
      .withColumn("fp", md5($"text"))
      .filter($"n_words".between(30, 4000) &&
        length(trim($"text")) > 0 && $"text".rlike("[A-Za-z]"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"fp", $"n_words")
      .orderBy($"doc_id")
  }

  val corpusFilterSql: String =
    """WITH gated AS (
      |  SELECT doc_id, lang, md5(text) AS fp,
      |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) BETWEEN 30 AND 4000
      |    AND length(trim(text)) > 0 AND regexp_matches(text, '[A-Za-z]')),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
      |  FROM gated)
      |SELECT doc_id, lang, fp, n_words FROM ranked WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** p2: stratified sample — per-language keep rates applied via a
    * deterministic hash coin: keep iff the first 4 hex chars of
    * md5(doc_id) sort below the rate threshold (lowercase hex compares
    * lexically == numerically, so the Spark and DuckDB predicates are
    * byte-identical). en 50%, es 75%, everything else 100%.
    */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val coin = substring(md5($"doc_id".cast("string")), 1, 4)
    val threshold = when($"lang" === "en", lit("8000"))
      .when($"lang" === "es", lit("c000"))
      .otherwise(lit("zzzz")) // above any hex digit: keep all
    Tables.documents(s, d)
      .filter(coin < threshold)
      .select($"doc_id", $"lang", coin.as("coin"))
      .orderBy($"doc_id")
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS coin
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |  CASE WHEN lang = 'en' THEN '8000'
      |       WHEN lang = 'es' THEN 'c000'
      |       ELSE 'zzzz' END
      |ORDER BY doc_id""".stripMargin

  /** p3: token-budget packing: per language, concatenate docs in doc_id
    * order and chunk at 2048 whitespace tokens — each doc's bin is the
    * 2048-chunk its START offset falls in (concat-then-chunk packing).
    * Output: per (lang, bin) doc count and token sum. All-integer math.
    */
  def tokenPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .withColumn("n_tok", size(split($"text", " ")).cast("long"))
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("bin", expr("(cum - n_tok) div 2048"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tokens"))
      .orderBy($"lang", $"bin")
  }

  val tokenPackSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |cums AS (
      |  SELECT lang, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM toks)
      |SELECT lang, CAST((cum - n_tok) // 2048 AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
      |FROM cums
      |GROUP BY 1, 2
      |ORDER BY lang, bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_corpus_filter"     -> (corpusFilter _),
    "p2_stratified_sample" -> (stratifiedSample _),
    "p3_token_pack"        -> (tokenPack _))

  val oracle: Map[String, String] = Map(
    "p1_corpus_filter"     -> corpusFilterSql,
    "p2_stratified_sample" -> stratifiedSampleSql,
    "p3_token_pack"        -> tokenPackSql)
}
