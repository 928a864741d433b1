package graft.operators

import graft.{Ora, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table: tumbling, sliding, session
  * (SURVEY.md §2-B "time/streaming-style"). Batch semantics here — the same
  * `window`/`session_window` expressions run unchanged under Structured
  * Streaming with a watermark (see graft.streaming.EventStreams), which is the
  * 100 TB/day ingestion path.
  *
  * Window starts are emitted as epoch seconds (BIGINT) rather than timestamps:
  * the fixture `ts` is nanosecond parquet and epoch arithmetic sidesteps
  * engine-dependent ns->us truncation in timestamp output.
  */
object TimeWindows {
  import Ora._

  /** 15-minute tumbling windows: event count + value sum per window x type. */
  def tumbling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select(
        unix_timestamp($"w.start").as("w_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }

  val tumblingSql: String =
    s"""SELECT (CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) * 900) AS w_start,
       | event_type, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows: 1-hour length, 15-minute slide (each event lands in 4
    * windows).
    */
  def sliding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), davg($"value").as("avg_value"))
      .select(unix_timestamp($"w.start").as("w_start"), $"n", $"avg_value")
      .orderBy($"w_start")
  }

  val slidingSql: String =
    s"""SELECT (CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) - k) * 900 AS w_start,
       | COUNT(*) AS n, ${sqlAvg("value")} AS avg_value
       |FROM events CROSS JOIN generate_series(0, 3) AS g(k)
       |GROUP BY 1
       |ORDER BY w_start""".stripMargin

  /** Session windows with a 30-minute inactivity gap, per user. Oracle
    * reproduces the half-open session semantics (gap >= 30 min starts a new
    * session) with the gaps-and-islands idiom.
    */
  def sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select(
        $"user_id",
        unix_timestamp($"sw.start").as("sess_start"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"sess_start")
  }

  val sessionsSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
       |           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events),
       |numbered AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged)
       |SELECT user_id,
       | CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS sess_start,
       | COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
       |FROM numbered
       |GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_start""".stripMargin

  /** q62: cumulative distinct users per day — the growth-dashboard
    * metric whose naive form (COUNT(DISTINCT) OVER a growing frame) is
    * QUADRATIC and unshardable. The scalable identity: a user's
    * contribution to the cumulative curve happens exactly once, on their
    * FIRST day — so cum_distinct(day) = running_sum(new_users), where
    * new_users comes from one user-keyed min() aggregation. Shapes: one
    * user-keyed agg + two day-keyed aggs + a triangle self-join running
    * sum over the per-DAY frame (#days² calendar pairs — trivial, and it
    * keeps the plan free of single-partition windows). Daily active
    * users ride along for the new-vs-returning read.
    */
  def cumulativeDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", date_trunc("day", $"ts").as("day"))
    val newPerDay = ev.groupBy($"user_id").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    val active = ev.groupBy($"day")
      .agg(countDistinct($"user_id").as("active_users"))
    // cumulative via a triangle self-join over the per-day frame (exact
    // BIGINT sums; #days² pairs — trivial at any corpus size) instead of
    // an unpartitioned running-sum window: keeps the whole suite free of
    // single-partition WindowExec stages (PlanAuditSpec pins this).
    val base = active.join(newPerDay, Seq("day"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
    base
      .join(broadcast(base.select($"day".as("d2"), $"new_users".as("nu2"))),
        $"d2" <= $"day")
      .groupBy($"day", $"active_users", $"new_users")
      .agg(sum($"nu2").as("cum_distinct_users"))
      .select(unix_timestamp($"day").as("day_s"), $"active_users",
        $"new_users", $"cum_distinct_users")
      .orderBy($"day_s")
  }

  val cumulativeDistinctSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('day', ts) AS day FROM events),
      |nu AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
      |  FROM (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1) f
      |  GROUP BY 1),
      |au AS (
      |  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
      |  FROM ev GROUP BY 1)
      |SELECT CAST(FLOOR(EPOCH(au.day)) AS BIGINT) AS day_s, active_users,
      |  COALESCE(nu.new_users, 0) AS new_users,
      |  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY au.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_distinct_users
      |FROM au LEFT JOIN nu USING (day)
      |ORDER BY day_s""".stripMargin

  /** q53: hourly gap-fill with last-observation-carried-forward — the
    * time-series densification every metrics/feature pipeline needs (a
    * model reads a value for EVERY hour, not just hours with events).
    * Per sampled user: the hourly activity series over the user's own
    * [first, last] hour span, absent hours carrying the last observed
    * hourly count (`filled` marks them). Hour index = integer micros div
    * 3.6e9 — exact on both engines, no float epoch. Scale shape: one
    * narrow agg, a per-user spine explode (bounded by the span), one
    * partitioned LOCF window — all keyed by user, no global sort until
    * the output contract's ORDER BY.
    */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perHour = Tables.events(s, d)
      .filter($"user_id" % 10 === 0)
      .select($"user_id", expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy($"user_id", $"hr").agg(count(lit(1)).as("n"))
    val spine = perHour.groupBy($"user_id")
      .agg(min($"hr").as("h0"), max($"hr").as("h1"))
      .select($"user_id", explode(expr("sequence(h0, h1)")).as("hr"))
    spine.join(perHour, Seq("user_id", "hr"), "left")
      .withColumn("filled", $"n".isNull)
      .withColumn("n", last($"n", ignoreNulls = true).over(w))
      .select($"user_id", ($"hr" * 3600L).as("hr_start"), $"n", $"filled")
      .orderBy($"user_id", $"hr_start")
  }

  val gapFillSql: String =
    """WITH ph AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
      |  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
      |spans AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM ph GROUP BY 1),
      |spine AS (
      |  SELECT s.user_id, CAST(g.g AS BIGINT) AS hr
      |  FROM spans s CROSS JOIN LATERAL (
      |    SELECT unnest(generate_series(s.h0, s.h1)) AS g) g)
      |SELECT sp.user_id, sp.hr * 3600 AS hr_start,
      |  last_value(ph.n IGNORE NULLS) OVER (
      |    PARTITION BY sp.user_id ORDER BY sp.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
      |  ph.n IS NULL AS filled
      |FROM spine sp LEFT JOIN ph ON sp.user_id = ph.user_id AND sp.hr = ph.hr
      |ORDER BY sp.user_id, hr_start""".stripMargin

  /** q54: ordered funnel — view → click → purchase per user, each stage
    * the EARLIEST qualifying event after the previous stage, the whole
    * funnel constrained to [[FunnelWindowUs]] after the first view (the
    * product-analytics conversion query). Three keyed min-aggregates
    * chained by per-user scalar joins — each stage is one shuffle on
    * user_id, no window over the raw stream, no event explosion.
    */
  val FunnelWindowUs: Long = 7L * 24 * 3600 * 1000000L

  def funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", expr("unix_micros(ts)").as("tus"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"tus").as("v_us"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id"))
      .filter($"tus" > $"v_us" && $"tus" <= $"v_us" + FunnelWindowUs)
      .groupBy($"user_id").agg(min($"tus").as("c_us"))
    val p = ev.filter($"event_type" === "purchase")
      .join(v, Seq("user_id")).join(c, Seq("user_id"))
      .filter($"tus" > $"c_us" && $"tus" <= $"v_us" + FunnelWindowUs)
      .groupBy($"user_id").agg(min($"tus").as("p_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id",
        expr("v_us div 1000000").as("view_s"),
        expr("c_us div 1000000").as("click_s"),
        expr("p_us div 1000000").as("purchase_s"),
        (lit(1L) + when($"c_us".isNotNull, 1L).otherwise(0L)
          + when($"p_us".isNotNull, 1L).otherwise(0L)).as("stages"))
      .orderBy($"user_id")
  }

  val funnelSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |v AS (SELECT user_id, MIN(tus) AS v_us FROM ev
       |  WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, MIN(e.tus) AS c_us
       |  FROM ev e JOIN v USING (user_id)
       |  WHERE e.event_type = 'click' AND e.tus > v.v_us
       |    AND e.tus <= v.v_us + $FunnelWindowUs GROUP BY 1),
       |p AS (SELECT e.user_id, MIN(e.tus) AS p_us
       |  FROM ev e JOIN v USING (user_id) JOIN c USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.tus > c.c_us
       |    AND e.tus <= v.v_us + $FunnelWindowUs GROUP BY 1)
       |SELECT v.user_id,
       |  v_us // 1000000 AS view_s,
       |  c_us // 1000000 AS click_s,
       |  p_us // 1000000 AS purchase_s,
       |  1 + CAST(c_us IS NOT NULL AS BIGINT)
       |    + CAST(p_us IS NOT NULL AS BIGINT) AS stages
       |FROM v
       |LEFT JOIN c USING (user_id)
       |LEFT JOIN p USING (user_id)
       |ORDER BY user_id""".stripMargin

  /** q55: retention cohorts — the weekly triangle every growth dashboard
    * is built on: users grouped by signup week (their earliest 'signup'
    * event), and for each later week, how many were active (any event).
    * Week index = integer micros div a week's micros (exact both
    * engines). Shapes: one min-agg for cohorts, one distinct activity
    * projection, one keyed join + count-distinct — all user_id-keyed
    * shuffles, count-distinct collapsed map-side by the (cohort, period,
    * user) pre-distinct.
    */
  val WeekUs: Long = 7L * 24 * 3600 * 1000000L

  def retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type",
        expr(s"unix_micros(ts) div ${WeekUs}L").as("wk"))
    val cohorts = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    val active = ev.select($"user_id", $"wk").distinct()
    cohorts.join(active, Seq("user_id"))
      .filter($"wk" >= $"cohort_wk")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("period"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_wk", $"period")
  }

  val retentionSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) // $WeekUs AS wk FROM events),
       |cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev
       |  WHERE event_type = 'signup' GROUP BY 1),
       |active AS (SELECT DISTINCT user_id, wk FROM ev)
       |SELECT c.cohort_wk, a.wk - c.cohort_wk AS period,
       |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
       |FROM cohorts c JOIN active a USING (user_id)
       |WHERE a.wk >= c.cohort_wk
       |GROUP BY 1, 2
       |ORDER BY cohort_wk, period""".stripMargin

  /** q64: event-type transition matrix — the Markov view of user
    * journeys (what q54's fixed view→click→purchase funnel generalizes
    * to). Per user, events ordered by (ts, event_id) — the unique
    * tie-break discipline — yield lag pairs (from_type → to_type);
    * transition probability is exact integer ppm of the from-type's
    * outgoing total.
    *
    * Scale: one user-keyed window (the per-user event list is the same
    * exchange every session/funnel query here rides) and two small aggs
    * on (from, to) — the output is |types|² rows regardless of input
    * size, so the tail of the plan is constant-sized at any scale.
    */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy($"from_type")
      .agg(sum($"n").as("from_total"))
    pairs.join(totals, Seq("from_type"))
      .select($"from_type", $"to_type", $"n", $"from_total",
        expr("n * 1000000L div from_total").as("p_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, to_type, COUNT(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS from_total
      |  FROM pairs GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n, t.from_total,
      |  p.n * 1000000 // t.from_total AS p_ppm
      |FROM pairs p JOIN tot t USING (from_type)
      |ORDER BY p.from_type, p.to_type""".stripMargin

  /** Microseconds per day — q65's bucketing unit. */
  val DayUs: Long = 24L * 3600 * 1000000L

  /** q65: semi-additive measure rollup — the balance/inventory aggregation
    * pattern where a measure is additive ACROSS users but not across time:
    * treating `value` as each user's account level, the day's total is the
    * sum of every active user's LAST reading that day (ROW_NUMBER desc over
    * the (ts, event_id) unique order), never the sum of all readings. This
    * is the one aggregation shape a plain groupBy cannot express — it needs
    * the per-(user, day) closing row picked before the cross-user sum.
    *
    * Scale: one window keyed by (user_id, day) — high cardinality, so the
    * exchange spreads evenly (no single-partition window) — then a day-keyed
    * partial-aggregating sum; both shuffles are on real keys and AQE-safe.
    * The double sum rides [[Ora.dsum]] so 1000-way partial aggregation is
    * bit-identical to DuckDB's single-node scan.
    */
  def semiAdditive(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts", $"value",
        expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
    val w = Window.partitionBy($"user_id", $"day")
      .orderBy($"ts".desc, $"event_id".desc)
    ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .groupBy($"day")
      .agg(count(lit(1)).as("n_users"), dsum($"value").as("eod_total"))
      .orderBy($"day")
  }

  val semiAdditiveSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, ts, value,
       |    epoch_us(ts) // $DayUs AS day
       |  FROM events),
       |eod AS (
       |  SELECT day, user_id, value FROM (
       |    SELECT day, user_id, value,
       |      ROW_NUMBER() OVER (PARTITION BY user_id, day
       |        ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM ev) WHERE rn = 1)
       |SELECT day, COUNT(*) AS n_users, ${sqlSum("value")} AS eod_total
       |FROM eod
       |GROUP BY day
       |ORDER BY day""".stripMargin

  /** q72: interval COVERAGE — per user, the union length of overlapping
    * activity intervals (each event opens [ts, ts+15 min)): the
    * "effective time engaged" measure that double-counts nothing however
    * events cluster, and the classic interval-union algorithm expressed
    * relationally: order a user's intervals by start, carry the running
    * max end over PRECEDING rows, and a new island begins exactly where
    * start > that max (strictly — touching intervals merge). Emits per
    * user the merged-interval count and total covered microseconds.
    *
    * Scale: one user-keyed window (the family's shared exchange) + one
    * user agg; no self-join of intervals, no explode over time grids.
    */
  def intervalCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spanUs = 15L * 60 * 1000000L
    val iv = Tables.events(s, d)
      .select($"user_id", $"event_id",
        expr("unix_micros(ts)").as("st"),
        (expr("unix_micros(ts)") + spanUs).as("en"))
    val w = Window.partitionBy($"user_id").orderBy($"st", $"event_id")
    val runMax = w.rowsBetween(Window.unboundedPreceding, -1)
    val islanded = iv
      .withColumn("prev_max_en", max($"en").over(runMax))
      .withColumn("new_island",
        when($"prev_max_en".isNull || $"st" > $"prev_max_en", 1L).otherwise(0L))
      .withColumn("island", sum($"new_island").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islanded.groupBy($"user_id", $"island")
      .agg(min($"st").as("ist"), max($"en").as("ien"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"ien" - $"ist").as("covered_us"))
      .orderBy($"user_id")
  }

  val intervalCoverageSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS st,
      |    epoch_us(ts) + 900000000 AS en
      |  FROM events),
      |marked AS (
      |  SELECT user_id, st, en,
      |    CASE WHEN MAX(en) OVER (PARTITION BY user_id
      |        ORDER BY st, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR st > MAX(en) OVER (PARTITION BY user_id
      |        ORDER BY st, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island,
      |    event_id
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, st, en,
      |    SUM(new_island) OVER (PARTITION BY user_id
      |      ORDER BY st, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM marked),
      |merged AS (
      |  SELECT user_id, island, MIN(st) AS ist, MAX(en) AS ien
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_intervals,
      |  CAST(SUM(ien - ist) AS BIGINT) AS covered_us
      |FROM merged
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q76: LWW state compaction over an event log — for each (user_id,
    * event_type) the LATEST event's payload (ts DESC, event_id DESC as
    * the unique tie-break), plus how many events folded into it: a
    * changelog materialized to its current-state table, the shape every
    * CDC consumer builds first. ONE max-struct aggregation — a single
    * map-side-combining shuffle on the key, no sort anywhere. The naive
    * per-key ROW_NUMBER window computes the same answer at a full
    * sort-per-key cost, and the corpus-wide rank variant is the
    * 100 TB-fatal shape DistRank exists for; this query needs neither —
    * the struct max IS the argmax. `value` rides the struct untouched
    * (selected, never summed — double-safe by construction).
    */
  def latestPerKey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", $"event_type",
        struct(unix_micros($"ts").as("tsu"), $"event_id",
          $"value").as("ev"))
      .groupBy($"user_id", $"event_type")
      .agg(max($"ev").as("m"), count(lit(1)).as("n_folded"))
      .select($"user_id", $"event_type", $"m.tsu".as("tsu"),
        $"m.event_id".as("event_id"), $"m.value".as("v"), $"n_folded")
      .orderBy($"user_id", $"event_type")
  }

  val latestPerKeySql: String =
    """SELECT user_id, event_type, tsu, event_id, v, n_folded FROM (
      |  SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id,
      |    value AS v,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_folded
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** q77: OHLC bars — the time-series downsample every monitoring/market
    * pipeline runs: per (event_type, hour) the OPEN (first value), HIGH,
    * LOW, CLOSE (last value) and event count, computed in ONE map-side-
    * combining aggregation — open/close are q76's struct-argmax trick
    * (min/max over (tsu, event_id, value) structs, event_id the unique
    * tie-break), high/low are plain MIN/MAX. No window, no sort-per-key,
    * no second scan: four struct/scalar aggregates share one exchange
    * keyed by (event_type, hour). Doubles are SELECTED (ride the argmin/
    * argmax struct) or COMPARED (min/max) — never summed, so bars are
    * exact in both engines by construction. Hour buckets emitted as
    * epoch-second BIGINTs (the fixture-drift-proof form).
    */
  def ohlcBars(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        expr("unix_micros(ts) div 3600000000").as("hb"),
        unix_micros($"ts").as("tsu"), $"event_id", $"value")
      .select($"event_type", ($"hb" * 3600L).as("hour"),
        struct($"tsu", $"event_id", $"value").as("ev"))
      .groupBy($"event_type", $"hour")
      .agg(min($"ev").as("o"), max($"ev").as("c"),
        min($"ev.value").as("low"), max($"ev.value").as("high"),
        count(lit(1)).as("n_events"))
      .select($"event_type", $"hour", $"o.value".as("open"), $"high",
        $"low", $"c.value".as("close"), $"n_events")
      .orderBy($"event_type", $"hour")
  }

  val ohlcBarsSql: String =
    """SELECT event_type, hour,
      |  MIN(CASE WHEN rna = 1 THEN value END) AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  MIN(CASE WHEN rnd = 1 THEN value END) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM (
      |  SELECT event_type, (epoch_us(ts) // 3600000000) * 3600 AS hour,
      |    value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type,
      |      (epoch_us(ts) // 3600000000)
      |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS rna,
      |    ROW_NUMBER() OVER (PARTITION BY event_type,
      |      (epoch_us(ts) // 3600000000)
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnd
      |  FROM events) t
      |GROUP BY event_type, hour
      |ORDER BY event_type, hour""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_ohlc_bars" -> (ohlcBars _),
    "q76_latest_per_key" -> (latestPerKey _),
    "q72_interval_coverage" -> (intervalCoverage _),
    "q65_semi_additive" -> (semiAdditive _),
    "q64_markov_transitions" -> (markovTransitions _),
    "q32_win_tumbling" -> (tumbling _),
    "q33_win_sliding"  -> (sliding _),
    "q34_win_session"  -> (sessions _),
    "q53_gap_fill"     -> (gapFill _),
    "q62_cumulative_distinct" -> (cumulativeDistinct _),
    "q54_funnel"       -> (funnel _),
    "q55_retention"    -> (retention _))

  val oracle: Map[String, String] = Map(
    "q77_ohlc_bars" -> ohlcBarsSql,
    "q76_latest_per_key" -> latestPerKeySql,
    "q72_interval_coverage" -> intervalCoverageSql,
    "q65_semi_additive" -> semiAdditiveSql,
    "q64_markov_transitions" -> markovTransitionsSql,
    "q32_win_tumbling" -> tumblingSql,
    "q33_win_sliding"  -> slidingSql,
    "q34_win_session"  -> sessionsSql,
    "q53_gap_fill"     -> gapFillSql,
    "q62_cumulative_distinct" -> cumulativeDistinctSql,
    "q54_funnel"       -> funnelSql,
    "q55_retention"    -> retentionSql)
}
