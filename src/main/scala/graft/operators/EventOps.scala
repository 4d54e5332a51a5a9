package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (the batch faces of the
  * streaming operators in graft.streaming — same logical plans a Structured
  * Streaming job runs incrementally with a watermark).
  *
  * Sessionization uses microsecond-exact integer gap arithmetic
  * (`unix_micros`) so gap comparisons are deterministic; window frames carry
  * `event_id` as the tiebreaker for a total order.
  */
object EventOps {

  private val SessionGapUs = 1800L * 1000 * 1000 // 30 min

  /** Hourly OHLC bars per event type over a (event_id, ts, event_type,
    * value) frame. open/close are min_by/max_by over an EXACT composite
    * ordering key — micros·1e6 + event_id as DECIMAL(38,0), overflow-
    * free and total even under duplicate timestamps — so the picked
    * values are deterministic, not first-row-wins. One scan, one
    * map-side-combined aggregation on (type, hour): min_by/max_by
    * partials carry a single (key, value) pair each, so the shuffle
    * moves O(groups), never the events. Volume follows the repo-wide
    * fixed-point sum convention.
    */
  def ohlcBars(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(ohlcAggs.head, ohlcAggs.tail: _*)

  /** The exact composite ordering key open/close pick by:
    * micros·1e18 + event_id as DECIMAL(38,0) — total even under
    * duplicate timestamps, overflow-free (micros ~1.7e15 × 1e18 ≈
    * 1.7e33 < 1e38). The multiplier must EXCEED every possible
    * event_id or two distinct events could share a key and the
    * min_by/max_by pick would be engine-arbitrary; 1e18 covers any id
    * a BIGINT column can hold at corpus scale, where the earlier 1e6
    * silently leaned on the generator assigning ids densely in ts
    * order. ONE definition shared by the batch bars and the sm21
    * streaming twin (so the twin cannot drift from the oracle it
    * claims verbatim).
    */
  def ohlcKey: org.apache.spark.sql.Column =
    unix_micros(col("ts")).cast("decimal(38,0)") *
      lit("1000000000000000000").cast("decimal(38,0)") + col("event_id")

  /** The five OHLC aggregates + fixed-point volume over [[ohlcKey]]. */
  def ohlcAggs: Seq[org.apache.spark.sql.Column] = Seq(
    min_by(col("value"), ohlcKey).as("open_v"),
    max(col("value")).as("high_v"),
    min(col("value")).as("low_v"),
    max_by(col("value"), ohlcKey).as("close_v"),
    count(lit(1)).as("n_events"),
    (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0)
      .as("volume"))

  /** ev3/ev5's shared top-2-per-user builder (WITHOUT the final
    * orderBy, so ev5 can materialize under its installed rule first)
    * and the one oracle string both rows verify against — the
    * stock-vs-custom comparison is only meaningful while the two
    * sides are definitionally identical.
    */
  private def topPurchases(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select("user_id", "rn", "event_id", "value")
  }

  private val topPurchasesSql =
    """SELECT user_id, rn, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |WHERE rn <= 2 ORDER BY user_id, rn""".stripMargin

  /** ev8/ev12's shared hourly fixture: per-(user, hour) fixed-point
    * observations over the sampled users, plus the dense per-user
    * hourly GRID spanning first..last observed hour. ONE definition
    * for both gap-fill queries (they previously duplicated it and
    * could drift), and the grid span derives from `obs` — already
    * |users × hours|-sized — NOT from the raw stream: deriving h0/h1
    * from events re-scanned and re-aggregated the fact table a second
    * time for the same answer.
    */
  private def hourlyObsAndGrid(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val obs = Tables(s, dir, "events")
      .filter(col("user_id") % 23 === 0)
      .select(
        col("user_id"),
        date_trunc("hour", col("ts")).as("h"),
        round(col("value") * 10000).cast("long").as("v_fx"))
      .groupBy("user_id", "h").agg(sum("v_fx").as("hour_fx"))
    val grid = obs.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(
        col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    (obs, grid)
  }

  /** The oracle twin of [[hourlyObsAndGrid]] (e/obs/grid CTEs),
    * shared by ev8/ev12 — the grid spans min..max of obs, which is
    * definitionally the same span as over e.
    */
  private val gapCtesSql =
    """e AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(round(value * 10000) AS BIGINT) AS v_fx
      |  FROM events WHERE user_id % 23 = 0),
      |obs AS (
      |  SELECT user_id, h, CAST(SUM(v_fx) AS BIGINT) AS hour_fx
      |  FROM e GROUP BY user_id, h),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM obs GROUP BY user_id)""".stripMargin

  /** ev13's half-life in microseconds (7 days) — interpolated into
    * both engines' arithmetic from one constant.
    */
  private val HalfLifeUs = 604800000000L

  /** Taylor coefficients of exp2(−f) = e^(−f·ln2), c_i = (−ln2)^i/i!,
    * in E-NOTATION — scientific notation parses straight to a
    * correctly-rounded DOUBLE on both engines, whereas DuckDB routes a
    * plain decimal literal through DECIMAL and the DECIMAL→DOUBLE cast
    * double-rounds: the c₄ and c₅ entries here measurably landed 1 ulp
    * off the JVM's parse in their plain-decimal form (the same
    * literal-syntax trap [[graft.functions.LnExact]]'s object doc
    * dissects; every coefficient below is verified to parse to
    * identical bits on both engines).
    */
  private val Exp2Coefs = Seq(
    "1.00000000000000000e+00", "-6.93147180559945286e-01",
    "2.40226506959100694e-01", "-5.55041086648215762e-02",
    "9.61812910762847688e-03", "-1.33335581464284411e-03",
    "1.54035303933816061e-04", "-1.52527338040598377e-05",
    "1.32154867901443053e-06", "-1.01780860092396960e-07",
    "7.05491162080112088e-09")

  /** Horner form of exp2(−f) over `f` ∈ [0,1) — identical text on both
    * engine sides, only +,*,/ (IEEE correctly rounded), so the value
    * is bit-identical wherever doubles are; truncation error ≤ 5e-10.
    */
  private def exp2NegHorner(f: String): String =
    Exp2Coefs.reverse.reduce((acc, c) => s"($acc * $f + $c)")

  val all: Seq[Q] = Seq(
    // Tumbling-window aggregation: hourly counts + fixed-point value sums.
    // Streaming twin: groupBy(window($"ts", "1 hour"), $"event_type").
    Q(
      "ev1_hourly_agg",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0)
              .as("total_value"))
          .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             |  CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)/10000.0 AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)
    ),

    // Sessionization: 30-minute-gap sessions per user via lag + running sum.
    // Streaming twin: flatMapGroupsWithState with a session-gap timeout.
    Q(
      "ev2_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapped = Tables(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn(
            "new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
              .otherwise(0L))
          .withColumn(
            "session_id",
            sum(col("new_session"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        gapped
          .groupBy("user_id", "session_id")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH g AS (
              |  SELECT user_id, ts, event_id,
              |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
              |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |sid AS (
              |  SELECT user_id, ts,
              |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              |  FROM g)
              |SELECT user_id, session_id, count(*) AS n_events,
              |  min(ts) AS session_start, max(ts) AS session_end
              |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
    ),

    // Top-2 purchases per user: ranking window with deterministic tiebreak.
    Q(
      "ev3_top_purchases_per_user",
      (s, dir) => topPurchases(s, dir).orderBy("user_id", "rn"),
      Some(topPurchasesSql)
    ),

    // EV5: the SAME top-2-per-user query as ev3 — ONE shared builder
    // and oracle string, so the answer-preservation claim can never
    // silently void if ev3 is tuned — executed by the custom
    // TopKPerKey operator stack (graft.plans): the optimizer rule
    // replaces the Filter+Window pair with partial per-partition bounded
    // heaps -> hash exchange -> final per-key rank emission, so the
    // shuffle carries <= k rows per (partition, key) instead of every
    // purchase, and nothing is globally sorted but the k survivors.
    // Driver-verifying it against the identical oracle as ev3 proves the
    // whole-operator extension answer-preserving, not just plan-shaped.
    // The rule is installed only around THIS query's materialization
    // (eager localCheckpoint) and uninstalled after: a session-wide
    // install would silently reroute ev3 — and every other
    // Filter+row_number query that happens to run later — through the
    // custom operator, voiding ev3's stock-Window baseline.
    Q(
      "ev5_topk_per_key",
      (s, dir) => {
        graft.plans.TopKPerKey.install(s)
        val out =
          try topPurchases(s, dir).localCheckpoint(true)
          finally graft.plans.TopKPerKey.uninstall(s)
        out.orderBy("user_id", "rn")
      },
      Some(topPurchasesSql)
    ),

    // JSON property extraction from the props column. The cast is
    // regex-guarded to INTEGRAL strings on BOTH sides: a plain cast
    // would ABORT the Spark side under ANSI mode on any malformed
    // props.k, and even try_cast diverges on non-integral numerics
    // ('1.5' → NULL in Spark, 2 in DuckDB, which rounds numeric
    // string casts) — the guard pins one semantic: k is an integer
    // property, anything else reads NULL, identically in both engines.
    // The extraction is STAGED through a named column so the JSON
    // parse runs once per row: inlining it in both the guard and the
    // cast re-parsed props twice (CollapseProject won't inline a
    // non-cheap alias referenced twice, and get_json_object isn't
    // cheap — measured 0.57 → 1.42 s when this was written inline).
    Q(
      "ev4_json_extract",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("ks", get_json_object(col("props"), "$.k"))
          .select(
            col("event_id"),
            expr("CASE WHEN ks RLIKE '^-?[0-9]+$' " +
              "THEN try_cast(ks AS int) END").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
             |       THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    // EV6: conversion funnel — per user, the first view and the first
    // purchase AT OR AFTER it (sequential pattern matching, the
    // product-analytics staple). Shape: ONE window pass per user carries
    // a seen-view flag forward, then one aggregation derives both funnel
    // stages — a single shuffle on user_id, no self-join of the event
    // log against itself (the naive `purchases JOIN views ON ts >=`
    // form is quadratic per user). Timestamps stay integer micros so
    // the compare is exact; (user_id, ts) is unique in this corpus
    // (aj1's documented property), so the seen-view ordering is total.
    Q(
      "ev6_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("seen_view",
            max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("us"))).as("first_view_us"),
            min(when(col("event_type") === "purchase" && col("seen_view") === 1,
              col("us"))).as("conv_us"))
          .filter(col("first_view_us").isNotNull)
          .select(
            col("user_id"),
            col("first_view_us"),
            col("conv_us"),
            col("conv_us").isNotNull.as("converted"),
            expr("(conv_us - first_view_us) DIV 1000000").as("secs_to_convert"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
             |          FROM events WHERE event_type IN ('view', 'purchase')),
             |f AS (SELECT user_id, event_type, us,
             |        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |          OVER (PARTITION BY user_id ORDER BY us
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen_view
             |      FROM e),
             |g AS (SELECT user_id,
             |        min(CASE WHEN event_type = 'view' THEN us END) AS first_view_us,
             |        min(CASE WHEN event_type = 'purchase' AND seen_view = 1 THEN us END) AS conv_us
             |      FROM f GROUP BY user_id)
             |SELECT user_id, first_view_us, conv_us,
             |  conv_us IS NOT NULL AS converted,
             |  (conv_us - first_view_us) // 1000000 AS secs_to_convert
             |FROM g WHERE first_view_us IS NOT NULL ORDER BY user_id""".stripMargin)
    ),

    // EV7: cohort retention — users bucketed by first-activity week,
    // counted distinct in each subsequent week (the retention matrix
    // behind every engagement dashboard). One window pass assigns the
    // cohort, one distinct-aggregation builds the matrix: two shuffles
    // total (user_id, then the (cohort, offset) key with partial
    // distinct), never a per-week self-join. Week offsets are integer
    // micro arithmetic on UTC week boundaries — exact in both engines.
    Q(
      "ev7_cohort_retention",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
        Tables(s, dir, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .withColumn("cohort_week", min("wk").over(byUser))
          .groupBy(
            col("cohort_week"),
            expr("(unix_micros(wk) - unix_micros(cohort_week)) DIV 604800000000")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      // DuckDB's date_trunc('week') yields DATE (hour yields TIMESTAMP);
      // cast to TIMESTAMP to match Spark — caught by the type-sensitive
      // local gate before it could become a driver hash miss.
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
             |f AS (SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM e)
             |SELECT cohort_week,
             |  (epoch_us(wk) - epoch_us(cohort_week)) // 604800000000 AS week_offset,
             |  count(DISTINCT user_id) AS active_users
             |FROM f GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)
    ),

    // EV8: gap-fill / resample — regularize an irregular event stream
    // onto an hourly grid with last-observation-carried-forward, the
    // time-series prep every downstream forecaster/feature store wants.
    // Shape at scale: one groupBy(user, hour) with map-side combine, one
    // groupBy(user) for the per-user span, the grid is explode(sequence)
    // — rows generated distributed, proportional to span not to events —
    // then a user-keyed join + ONE window pass for the carry-forward.
    // Every shuffle is on user_id, so AQE reuses one partitioning.
    // Values are fixed-point (ev1's convention) so sums are
    // order-independent; the grid starts at each user's first
    // observation, so LOCF never reads before the partition start.
    Q(
      "ev8_gapfill_locf",
      (s, dir) => {
        val (obs, grid) = hourlyObsAndGrid(s, dir)
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(obs, Seq("user_id", "h"), "left")
          .select(
            col("user_id"), col("h"),
            last(col("hour_fx"), ignoreNulls = true).over(w).as("filled_fx"),
            col("hour_fx").isNull.as("gap"))
          .orderBy("user_id", "h")
      },
      Some(s"""WITH $gapCtesSql
             |SELECT g.user_id, g.h,
             |  last_value(o.hour_fx IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_fx,
             |  o.hour_fx IS NULL AS gap
             |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
             |ORDER BY g.user_id, g.h""".stripMargin)
    ),

    // EV9: per-user z-score outliers — the streaming-adjacent anomaly
    // gate (flag events far from the user's own distribution). Moments
    // come from EXACT integer sums (n, Σfx, Σfx²) in one map-side-
    // combined groupBy, then mean/σ/z are a FIXED double expression tree
    // over those integers — every op is IEEE-correctly-rounded (÷, ×,
    // −, sqrt), so both engines produce bit-identical doubles; neither
    // engine's built-in stddev is used (accumulation order would
    // differ). σ=0 users yield z=NaN — and BOTH engines order NaN above
    // every float, so `abs(z) > 2.5` alone would INCLUDE those rows;
    // the explicit NOT-isnan predicate below encodes the intended
    // exclusion rather than leaning on two engines agreeing on NaN
    // comparison semantics. One shuffle for moments, broadcast join
    // back, scan-side filter — at 100 TB the moment table is |users|
    // rows.
    Q(
      "ev9_zscore_outliers",
      (s, dir) => {
        val f = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            round(col("value") * 10000).cast("long").as("fx"))
        val st = f.groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum("fx").as("s1"),
          sum(col("fx") * col("fx")).as("s2"))
        val m = col("s1").cast("double") / col("n")
        val z = (col("fx").cast("double") - m) /
          sqrt(col("s2").cast("double") / col("n") - m * m)
        // st is |users|-sized — join strategy left to AQE (broadcast at
        // bench SFs, shuffle join on user_id when the user base outgrows
        // a broadcast; same principle as the dedup verify joins)
        f.join(st, Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("value"), z.as("z"))
          .filter(!isnan(col("z")) && abs(col("z")) > 2.5)
          .orderBy("event_id")
      },
      Some("""WITH f AS (SELECT event_id, user_id, value,
             |            CAST(round(value * 10000) AS BIGINT) AS fx FROM events),
             |st AS (SELECT user_id, count(*) AS n,
             |         CAST(SUM(fx) AS BIGINT) AS s1,
             |         CAST(SUM(fx * fx) AS BIGINT) AS s2
             |       FROM f GROUP BY user_id),
             |z AS (SELECT f.event_id, f.user_id, f.value,
             |        (CAST(fx AS DOUBLE) - CAST(s1 AS DOUBLE) / n) /
             |          sqrt(CAST(s2 AS DOUBLE) / n
             |               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS z
             |      FROM f JOIN st USING (user_id))
             |SELECT event_id, user_id, value, z FROM z
             |WHERE NOT isnan(z) AND abs(z) > 2.5 ORDER BY event_id""".stripMargin)
    ),

    // EV10: SLIDING-window aggregation — 7-day weekly-active-users
    // advancing daily, the one window shape ev1's tumbling windows
    // don't cover. Spark's window(ts, '7 days', '1 day') assigns each
    // event to exactly 7 epoch-aligned windows; the oracle derives the
    // same membership by exploding each event into day-truncated starts
    // t-0d..t-6d. Cost model: the explode is a per-row ×7 projection
    // (slide ratio), then ONE map-side-combined distinct aggregation —
    // at 100 TB pick slide granularity by that ratio, never by
    // self-joining the window spans. Streaming twin: identical groupBy
    // under a watermark.
    Q(
      "ev10_sliding_wau",
      (s, dir) =>
        // Equivalent to groupBy(window(ts, '7 days', '1 day')) — sm10
        // runs that form through the streaming runtime — but the batch
        // path dedupes (day, user) FIRST: WAU only cares about daily
        // activity, so the ×7 membership explode runs on |days×users|
        // rows instead of |events| (100k→~20k at sf0.1, and the gap
        // widens with event volume). Dedupe-before-explode is the
        // general rule for sliding distinct aggregates.
        Tables(s, dir, "events")
          .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
          .distinct()
          .select(
            col("user_id"),
            explode(expr("sequence(d - interval 6 days, d, interval 1 day)"))
              .as("w_start"))
          .groupBy("w_start")
          .agg(countDistinct(col("user_id")).as("wau"))
          .orderBy("w_start"),
      Some("""WITH e AS (SELECT user_id,
             |            CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events),
             |x AS (SELECT user_id, d - k * INTERVAL 1 DAY AS w_start
             |      FROM e CROSS JOIN unnest(generate_series(0, 6)) AS t(k))
             |SELECT w_start, count(DISTINCT user_id) AS wau
             |FROM x GROUP BY w_start ORDER BY w_start""".stripMargin)
    ),

    // EV11: hourly OHLC bars per event type — the time-series
    // downsampling shape (open/high/low/close + volume per bucket);
    // see [[ohlcBars]] for the determinism + shuffle story.
    Q(
      "ev11_ohlc_bars",
      (s, dir) =>
        ohlcBars(Tables(s, dir, "events")).orderBy("event_type", "hour"),
      Some("""SELECT event_type, date_trunc('hour', ts) AS hour,
             |  arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000000000 + event_id) AS open_v,
             |  max(value) AS high_v, min(value) AS low_v,
             |  arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000000000 + event_id) AS close_v,
             |  count(*) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)/10000.0 AS volume
             |FROM events GROUP BY 1, 2 ORDER BY event_type, hour""".stripMargin)
    ),

    // EV13: exponentially time-decayed popularity — trending-now
    // ranking where each event contributes 2^(−age/half_life) with a
    // 7-day half-life. Determinism rules: the decay anchor is the
    // corpus's own max(ts) (data-derived — `now()` would make the
    // answer a function of wall clock), ages are exact integer
    // microsecond differences, and each event's decayed weight is
    // fixed-point-rounded to a 1e-6 long BEFORE the per-type sum
    // (tx14's discipline — a double Σ2^(−age) would be partition-order
    // sensitive). One scan + one 1-row anchor broadcast + one
    // map-side-combined aggregation.
    //
    // The weight itself is computed WITHOUT libm pow: pow is not
    // correctly rounded and Java's and DuckDB's implementations
    // measurably differ by 1 ulp on ~0.1% of exponents in exactly
    // this range — a 1-in-1e13 per-event chance of flipping the 1e-6
    // rounding, i.e. a flaky cross-engine hash at corpus scale.
    // Instead: 2^(−age/hl) = 2^(−q) · exp2(−f) with q = age div hl
    // (exact integer), 2^(−q) an exact shift, and exp2(−f) a shared
    // degree-10 Horner polynomial over +,*,/ — all IEEE
    // correctly-rounded ops, so both engines evaluate the identical
    // expression text to the identical bits (within 5e-10 of true
    // exp2, far inside the 1e-6 quantum; q ≥ 21 rounds to 0 exactly).
    Q(
      "ev13_decayed_popularity",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val anchor = ev.agg(max(unix_micros(col("ts"))).as("t0"))
        ev.crossJoin(broadcast(anchor))
          .select(
            col("event_type"),
            (col("t0") - unix_micros(col("ts"))).as("age"))
          .select(
            col("event_type"),
            expr(s"age div $HalfLifeUs").as("q"),
            expr(s"CAST(age % $HalfLifeUs AS DOUBLE) / $HalfLifeUs.0").as("f"))
          .select(
            col("event_type"),
            expr(s"CASE WHEN q >= 21 THEN 0L ELSE CAST(FLOOR(" +
              s"${exp2NegHorner("f")} / shiftleft(1L, CAST(q AS INT)) " +
              "* 1000000.0 + 0.5) AS BIGINT) END").as("w6"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            (sum(col("w6")).cast("double") / 1000000.0).as("decayed_count"))
          .select(col("event_type"), col("n_events"),
            round(col("decayed_count"), 6).as("decayed_count"))
          .orderBy(desc("decayed_count"), asc("event_type"))
      },
      Some(s"""WITH t0 AS (SELECT max(epoch_us(ts)) AS t0 FROM events),
             |w0 AS (SELECT event_type, t0 - epoch_us(ts) AS age
             |       FROM events CROSS JOIN t0),
             |w1 AS (SELECT event_type, age // $HalfLifeUs AS q,
             |         CAST(age % $HalfLifeUs AS DOUBLE) / $HalfLifeUs.0 AS f
             |       FROM w0),
             |w AS (SELECT event_type,
             |        CASE WHEN q >= 21 THEN 0
             |             ELSE CAST(FLOOR(${exp2NegHorner("f")}
             |               / (CAST(1 AS BIGINT) << CAST(q AS INT))
             |               * 1000000.0 + 0.5) AS BIGINT) END AS w6
             |      FROM w1)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  ROUND(CAST(SUM(w6) AS DOUBLE) / 1000000.0, 6) AS decayed_count
             |FROM w GROUP BY event_type
             |ORDER BY decayed_count DESC, event_type ASC""".stripMargin)
    ),

    // EV12: gap-fill by LINEAR INTERPOLATION — ev8's carry-forward
    // sibling for quantities that trend rather than hold (sensor
    // readings, balances). Same per-user grid; each gap hour gets
    // prev + (next−prev)·Δ/span with TRUNCATING integer division
    // (both Spark's `div` and DuckDB's `//` round toward zero, so a
    // downward-trending gap's value truncates toward zero, not the
    // floor) over fixed-point values and epoch-hour indices, so the
    // interpolated series is bit-deterministic (no double ratio) and both grid
    // endpoints are observations by construction, so prev/next always
    // exist. Two window passes over the same user_id partitioning ev8
    // uses (backward carry + forward carry) — AQE reuses one shuffle.
    Q(
      "ev12_gapfill_interp",
      (s, dir) => {
        val (obs, grid) = hourlyObsAndGrid(s, dir)
        val joined = grid.join(obs, Seq("user_id", "h"), "left")
          .withColumn("h_idx", expr("unix_micros(h) div 3600000000"))
          .withColumn("obs_idx",
            when(col("hour_fx").isNotNull, col("h_idx")))
        val back = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        joined
          .withColumn("prev_fx", last(col("hour_fx"), ignoreNulls = true).over(back))
          .withColumn("prev_idx", last(col("obs_idx"), ignoreNulls = true).over(back))
          .withColumn("next_fx", first(col("hour_fx"), ignoreNulls = true).over(fwd))
          .withColumn("next_idx", first(col("obs_idx"), ignoreNulls = true).over(fwd))
          .select(
            col("user_id"), col("h"),
            when(col("hour_fx").isNotNull, col("hour_fx"))
              .otherwise(col("prev_fx") +
                expr("(next_fx - prev_fx) * (h_idx - prev_idx) div (next_idx - prev_idx)"))
              .as("interp_fx"),
            col("hour_fx").isNull.as("gap"))
          .orderBy("user_id", "h")
      },
      Some(s"""WITH $gapCtesSql,
             |j AS (
             |  SELECT g.user_id, g.h, o.hour_fx,
             |    epoch_us(g.h) // 3600000000 AS h_idx,
             |    CASE WHEN o.hour_fx IS NOT NULL
             |         THEN epoch_us(g.h) // 3600000000 END AS obs_idx
             |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h),
             |w AS (
             |  SELECT user_id, h, hour_fx, h_idx,
             |    last_value(hour_fx IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_fx,
             |    last_value(obs_idx IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_idx,
             |    first_value(hour_fx IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_fx,
             |    first_value(obs_idx IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_idx
             |  FROM j)
             |SELECT user_id, h,
             |  CASE WHEN hour_fx IS NOT NULL THEN hour_fx
             |       ELSE prev_fx + (next_fx - prev_fx) * (h_idx - prev_idx)
             |            // (next_idx - prev_idx) END AS interp_fx,
             |  hour_fx IS NULL AS gap
             |FROM w ORDER BY user_id, h""".stripMargin)
    )
  )
}
