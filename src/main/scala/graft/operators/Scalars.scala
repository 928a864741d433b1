package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, MapType, StringType}

/** Scalar-function surface: string / date / math / array / json functions
  * (SURVEY.md §2-B "scalar fns"). All built-in `functions._` — codegen'd, no
  * UDFs in the hot path.
  *
  * Cross-engine notes baked into the oracle SQL: DuckDB SUM(INT) returns
  * HUGEINT (cast to BIGINT), floor/ceil return DOUBLE (cast), list indexing is
  * 1-based in both `element_at` and DuckDB `[n]`, and transcendental results
  * (ln) go through a decimal(38,6) cast on both sides so a 1-ulp libm
  * difference cannot flip the comparison.
  */
object Scalars {
  private val Dec = DecimalType(38, 6)

  /** String functions over customer names. */
  def stringFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select(
        $"c_custkey",
        upper($"c_mktsegment").as("seg_upper"),
        lower($"c_name").as("name_lower"),
        substring($"c_name", 1, 8).as("name_prefix"),
        length($"c_name").cast("int").as("name_len"),
        concat_ws("|", $"c_mktsegment", $"c_name").as("seg_name"),
        regexp_extract($"c_name", "([0-9]+)", 1).as("name_digits"),
        element_at(split($"c_name", "#"), 2).as("name_num"),
        trim(lit("  pad  ")).as("trimmed"),
        replace($"c_mktsegment", lit("E"), lit("_")).as("seg_repl"),
        instr($"c_name", "#").cast("int").as("hash_pos"))
      .orderBy($"c_custkey")
  }

  val stringFnsSql: String =
    """SELECT c_custkey,
      | UPPER(c_mktsegment) AS seg_upper,
      | LOWER(c_name) AS name_lower,
      | SUBSTRING(c_name, 1, 8) AS name_prefix,
      | CAST(LENGTH(c_name) AS INTEGER) AS name_len,
      | c_mktsegment || '|' || c_name AS seg_name,
      | REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
      | STRING_SPLIT(c_name, '#')[2] AS name_num,
      | TRIM('  pad  ') AS trimmed,
      | REPLACE(c_mktsegment, 'E', '_') AS seg_repl,
      | CAST(STRPOS(c_name, '#') AS INTEGER) AS hash_pos
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Date/time functions over orders. */
  def dateFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("q"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).as("days_since"),
        ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due_date"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  val dateFnsSql: String =
    """SELECT o_orderkey,
      | CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
      | CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
      | CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
      | CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
      | DATE_TRUNC('month', o_orderdate) AS month_start,
      | CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
      | o_orderdate + INTERVAL 30 DAY AS due_date,
      | CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Math functions over part prices/sizes. */
  def mathFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select(
        $"p_partkey",
        round($"p_retailprice").as("price_round"),
        floor($"p_retailprice").as("price_floor"),
        ceil($"p_retailprice").as("price_ceil"),
        abs($"p_size" - 20).as("size_dist"),
        ($"p_retailprice" * $"p_retailprice").as("price_sq"),
        sqrt($"p_retailprice").as("price_sqrt"),
        log($"p_retailprice").cast(Dec).cast("double").as("price_ln"),
        ($"p_size" % 7).as("size_mod"),
        greatest($"p_size", lit(10)).as("size_min10"),
        least($"p_size", lit(40)).as("size_max40"))
      .orderBy($"p_partkey")
  }

  val mathFnsSql: String =
    """SELECT p_partkey,
      | ROUND(p_retailprice) AS price_round,
      | CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
      | CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
      | ABS(p_size - 20) AS size_dist,
      | p_retailprice * p_retailprice AS price_sq,
      | SQRT(p_retailprice) AS price_sqrt,
      | CAST(CAST(LN(p_retailprice) AS DECIMAL(38,6)) AS DOUBLE) AS price_ln,
      | p_size % 7 AS size_mod,
      | CAST(GREATEST(p_size, 10) AS INTEGER) AS size_min10,
      | CAST(LEAST(p_size, 40) AS INTEGER) AS size_max40
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Array/higher-order functions over tokenized part names. */
  def arrayFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withWords = Tables.part(s, d)
      .withColumn("words", split($"p_name", " "))
    withWords.select(
      $"p_partkey",
      size($"words").as("n_words"),
      array_contains($"words", "widget").as("has_widget"),
      element_at($"words", 1).as("first_word"),
      element_at($"words", -1).as("last_word"),
      array_join(sort_array($"words"), ",").as("sorted_words"),
      aggregate(transform($"words", w => length(w)), lit(0), (a, x) => a + x)
        .as("total_chars"))
      .orderBy($"p_partkey")
  }

  val arrayFnsSql: String =
    """SELECT p_partkey,
      | CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INTEGER) AS n_words,
      | LIST_CONTAINS(STRING_SPLIT(p_name, ' '), 'widget') AS has_widget,
      | STRING_SPLIT(p_name, ' ')[1] AS first_word,
      | STRING_SPLIT(p_name, ' ')[-1] AS last_word,
      | ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(p_name, ' ')), ',') AS sorted_words,
      | CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(p_name, ' '), w -> LENGTH(w))) AS INTEGER) AS total_chars
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Generator / UDTF-equivalent: explode tokenized names into a word
    * frequency table.
    */
  def explodeWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select(explode(split($"p_name", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"word")
  }

  val explodeWordsSql: String =
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS word FROM part) t
      |GROUP BY word
      |ORDER BY word""".stripMargin

  /** JSON functions over events.props (a JSON string column). */
  def jsonFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("m", from_json($"props", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)))
      .select(
        $"event_id",
        element_at($"m", "k").cast("int").as("k_int"),
        element_at($"m", "k").as("k_str"),
        element_at(map_keys($"m"), 1).as("first_key"))
      .orderBy($"event_id")
  }

  val jsonFnsSql: String =
    """SELECT event_id,
      | CAST(JSON_EXTRACT(props, '$.k') AS INTEGER) AS k_int,
      | JSON_EXTRACT_STRING(props, '$.k') AS k_str,
      | JSON_KEYS(props)[1] AS first_key
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Real MapType column surface (SURVEY §2-B map fns): parse events.props
    * into a map<string,string>, then exercise construction (map,
    * map_concat), introspection (map_keys / map_values / map_entries /
    * size), lookup (element_at on a present key, try_element_at on a
    * missing one — NULL, not error), and the higher-order map lambdas
    * (map_filter, transform_values). Map iteration order is not defined,
    * so every multi-valued emission is array_sort'ed before joining —
    * the oracle mirrors with list_sort.
    */
  def mapFns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("pm", from_json($"props", MapType(StringType, StringType)))
      .withColumn("m2", map_concat($"pm",
        map(lit("t"), $"event_type", lit("u"), $"user_id".cast("string"))))
      .filter($"event_id" % 11 === 0)
      .select(
        $"event_id",
        // try_element_at: NULL rather than ANSI MAP_KEY_DOES_NOT_EXIST if
        // a fixture row ever lacks 'k' (props shape invariant: CLAUDE.md)
        try_element_at($"pm", lit("k")).as("k_val"),
        size($"m2").as("n_keys"),
        array_join(array_sort(map_keys($"m2")), ",").as("keys_csv"),
        array_join(array_sort(map_values($"m2")), ",").as("vals_csv"),
        array_join(array_sort(transform(map_entries($"m2"),
          e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
          .as("entries_csv"),
        try_element_at($"m2", lit("missing")).as("miss_val"),
        array_join(array_sort(map_keys(
          map_filter($"m2", (k, _) => k =!= "u"))), ",").as("filtered_keys"),
        element_at(transform_values($"m2",
          (k, v) => concat(k, lit(":"), v)), "t").as("t_tagged"))
      .orderBy($"event_id")
  }

  val mapFnsSql: String =
    """WITH m AS (
      |  SELECT event_id,
      |    MAP {'k': JSON_EXTRACT_STRING(props, '$.k'),
      |         't': event_type,
      |         'u': CAST(user_id AS VARCHAR)} AS m2,
      |    JSON_EXTRACT_STRING(props, '$.k') AS kv,
      |    event_type AS tv
      |  FROM events
      |  WHERE event_id % 11 = 0)
      |SELECT event_id,
      |  kv AS k_val,
      |  CAST(CARDINALITY(m2) AS INTEGER) AS n_keys,
      |  ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(m2)), ',') AS keys_csv,
      |  ARRAY_TO_STRING(LIST_SORT(MAP_VALUES(m2)), ',') AS vals_csv,
      |  ARRAY_TO_STRING(LIST_SORT(LIST_TRANSFORM(MAP_ENTRIES(m2),
      |    e -> e.key || '=' || e.value)), ',') AS entries_csv,
      |  LIST_EXTRACT(MAP_EXTRACT(m2, 'missing'), 1) AS miss_val,
      |  ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(MAP_KEYS(m2),
      |    x -> x <> 'u')), ',') AS filtered_keys,
      |  't:' || tv AS t_tagged
      |FROM m
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_string_fns"    -> (stringFns _),
    "q27_date_fns"      -> (dateFns _),
    "q28_math_fns"      -> (mathFns _),
    "q29_array_fns"     -> (arrayFns _),
    "q30_explode_words" -> (explodeWords _),
    "q31_json_fns"      -> (jsonFns _),
    "q51_map_fns"       -> (mapFns _))

  val oracle: Map[String, String] = Map(
    "q26_string_fns"    -> stringFnsSql,
    "q27_date_fns"      -> dateFnsSql,
    "q28_math_fns"      -> mathFnsSql,
    "q29_array_fns"     -> arrayFnsSql,
    "q30_explode_words" -> explodeWordsSql,
    "q31_json_fns"      -> jsonFnsSql,
    "q51_map_fns"       -> mapFnsSql)
}
