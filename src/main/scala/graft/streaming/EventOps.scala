package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver-gated event queries: the batch `events` table run through
  * the SAME transforms the streaming runtime uses ([[EventStreams]]),
  * so the DuckDB oracles validate the streaming logic itself.
  */
object EventOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  // ---- e1: tumbling 1h window count/sum by event_type ----
  def e1TumblingAgg(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumbling(events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  lazy val e1Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---- e2: sliding 1h windows every 30min ----
  // Oracle: a 1h/30min sliding window family = the union of two
  // tumbling grids (offset 0 and offset 30min).
  def e2SlidingAgg(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sliding(events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  lazy val e2Sql: String =
    """WITH assigned AS (
      |  SELECT date_trunc('hour', ts) AS window_start, event_type, value FROM events
      |  UNION ALL
      |  SELECT date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE,
      |         event_type, value FROM events)
      |SELECT window_start, event_type, count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM assigned GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---- e3: 30-min-gap sessions per user (gaps-and-islands oracle) ----
  def e3Sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessions(events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  // New session only when the gap EXCEEDS 30 minutes: an event exactly
  // 30 minutes after the previous one extends the session, matching
  // Spark's session_window merge rule (adjacent windows [t, t+gap) and
  // [t+gap, t+2gap) touch and merge) and CustomSessions' inclusive
  // bounds — oracle, builtin and custom state agree on every input,
  // including exact-gap events (EventStreamsSpec pins the boundary).
  lazy val e3Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM islands GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  // ---- e4: dedup within key (batch analog of streaming dedup) ----
  // Streaming dropDuplicates keeps the first arrival; the deterministic
  // batch analog keeps min(event_id) per (user_id, event_type, minute).
  def e4StreamDedup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("minute"))
      .agg(min(col("event_id")).as("kept_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("user_id"), col("event_type"), col("minute"))

  lazy val e4Sql: String =
    """SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
      |  min(event_id) AS kept_id, count(*) AS n_dups
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY user_id, event_type, minute""".stripMargin

  // ---- e5: as-of join — each purchase ⟵ latest click at-or-before ----
  // Implemented as ONE window pass over the unioned, type-tagged
  // stream (sort-merge as-of), not a per-row range join: partition by
  // user, order by (ts, type-rank, event_id), carry the last non-null
  // click forward. At 100 TB this is a single shuffle on user_id with
  // no quadratic candidate blow-up — the standard as-of trick that
  // range joins can't match. Clicks rank before purchases at equal ts
  // ("at or before"); event_id breaks exact ties deterministically.
  def e5AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("tr", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("click_id",
        last(when(col("tr") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("tr") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tr") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_id"), col("click_ts"))
      .orderBy(col("purchase_id"))
  }

  lazy val e5Sql: String =
    """WITH tagged AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tr
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |carried AS (
      |  SELECT event_id, user_id, ts, tr,
      |    last_value(CASE WHEN tr = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, tr, event_id
      |            ROWS UNBOUNDED PRECEDING) AS click_id,
      |    last_value(CASE WHEN tr = 0 THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, tr, event_id
      |            ROWS UNBOUNDED PRECEDING) AS click_ts
      |  FROM tagged)
      |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |  click_id, click_ts
      |FROM carried WHERE tr = 1 ORDER BY purchase_id""".stripMargin

  // ---- e6: custom-state sessionizer (flatMapGroupsWithState) ----
  // Same session semantics as e3, computed through the custom
  // per-key-state API instead of the built-in session_window — the
  // SAME gaps-and-islands oracle gates the stateful code path.
  def e6CustomSessions(spark: SparkSession, dir: String): DataFrame =
    CustomSessions.batchSessions(spark, events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  // ---- e7: interval join (stream-stream join shape, batch-gated) ----
  def e7StreamJoin(spark: SparkSession, dir: String): DataFrame =
    EventStreams.intervalJoin(events(spark, dir))
      .orderBy(col("purchase_id"), col("click_id"))

  lazy val e7Sql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |  c.event_id AS click_id, c.ts AS click_ts
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND p.user_id = c.user_id
      | AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
      |ORDER BY purchase_id, click_id""".stripMargin

  // ---- e8: conversion funnel (view → first purchase after it) ----
  // The order-dependent pattern aggregate session analytics runs on
  // event streams: per user, the first 'view' and the first 'purchase'
  // AT OR AFTER it. Two key-partitioned aggregations and one co-
  // partitioned equi-join on user_id — both stages map-side combine,
  // nothing is ordered globally, so the plan is two shuffles of
  // pre-combined user rows at any scale. Delays are integer epoch
  // microseconds (exact on both engines; no interval arithmetic).
  def e8Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val conv = ev.filter(col("event_type") === "purchase").as("p")
      .join(firstView.as("v"),
        col("p.user_id") === col("v.user_id") && col("p.ts") >= col("v.view_ts"))
      .groupBy(col("v.user_id"), col("v.view_ts"))
      .agg(min(col("p.ts")).as("purchase_ts"))
    firstView.agg(count(lit(1)).as("n_viewers")).crossJoin(
      conv.agg(count(lit(1)).as("n_converted"),
        sum(unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("delay_us_total")))
  }

  lazy val e8Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS view_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT v.user_id, v.view_ts, min(p.ts) AS purchase_ts
      |  FROM v JOIN events p
      |    ON p.user_id = v.user_id AND p.event_type = 'purchase'
      |   AND p.ts >= v.view_ts
      |  GROUP BY v.user_id, v.view_ts)
      |SELECT (SELECT count(*) FROM v) AS n_viewers,
      |  count(*) AS n_converted,
      |  CAST(sum(epoch_us(CAST(purchase_ts AS TIMESTAMP))
      |         - epoch_us(CAST(view_ts AS TIMESTAMP))) AS BIGINT) AS delay_us_total
      |FROM c""".stripMargin

  // ---- e9: weekly cohort retention ----
  // The batch-analytics staple over event streams: users are grouped
  // into cohorts by their first-seen week; retention[k] = how many of
  // a cohort were active k weeks later. Plan shape at any scale:
  //  1. first-seen per user — one map-side-combined aggregate;
  //  2. activity join — events ⋈ cohorts co-partitioned on user_id
  //     (the same key both sides just shuffled on);
  //  3. distinct (cohort, week_n, user) then the count aggregate —
  //     both map-side combined.
  // Week arithmetic: both engines truncate to Monday (ISO), so the
  // day difference is a multiple of 7 and week_n = days DIV 7 is
  // exact; retention divides two exact longs in double (one IEEE op).
  def e9CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
      .join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        expr("CAST(datediff(act_week, cohort_week) DIV 7 AS BIGINT)").as("week_n"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_n"))
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), Seq("cohort_week"))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_n"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_week"), col("week_n"))
  }

  lazy val e9Sql: String =
    """WITH cohorts AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY cohort_week),
      |active AS (
      |  SELECT DISTINCT c.cohort_week,
      |    date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7 AS week_n,
      |    e.user_id
      |  FROM events e JOIN cohorts c USING (user_id)),
      |counts AS (
      |  SELECT cohort_week, week_n, count(*) AS n_active
      |  FROM active GROUP BY cohort_week, week_n)
      |SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
      |  CAST(a.week_n AS BIGINT) AS week_n, a.n_active, s.cohort_size,
      |  CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention
      |FROM counts a JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, week_n""".stripMargin

  // ---- e10: trending — top-k event types per tumbling window ----
  // The per-window leaderboard pattern: reuse e1's tumbling counts
  // (one map-side-combined aggregate), then rank WITHIN each window.
  // The ranking window partitions by window_start — window count
  // grows with the stream's lifetime, and rows per window are bounded
  // by the event-type vocabulary, so the sort inside each partition
  // is O(|types| log |types|) regardless of event volume. The stream
  // mode is [[EventStreams.trendingStream]] — the SAME rankWindows
  // body run per finalized watermark window (rank-on-emit, state
  // bounded exactly like e1's; TrendingStreamSpec proves the
  // exactly-once-per-window emission equals this batch rank).
  private val TrendK = 3

  def e10Trending(spark: SparkSession, dir: String): DataFrame =
    EventStreams.rankWindows(EventStreams.tumbling(events(spark, dir)), TrendK)
      .orderBy(col("window_start"), col("rank"))

  lazy val e10Sql: String =
    s"""WITH counts AS (
       |  SELECT date_trunc('hour', ts) AS window_start, event_type,
       |    count(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY window_start
       |        ORDER BY n_events DESC, event_type) AS rank FROM counts)
       |SELECT window_start, event_type, n_events, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $TrendK ORDER BY window_start, rank""".stripMargin

  // ---- e11: windowed anomaly detection — z-score vs trailing baseline ----
  // The monitoring op every event pipeline runs next to its
  // leaderboard: flag (type, hour) windows whose event count deviates
  // from the type's own trailing history. A window is anomalous when
  //   (x − μ)² > Z²·σ²   over the previous `AnomalyHist` OBSERVED
  // windows of that type (μ, σ² = trailing mean/population variance),
  // with at least `AnomalyMinHist` windows of history. The comparison
  // is done ENTIRELY in integer arithmetic — multiply through by n²:
  //   (n·x − s)² > Z²·(n·ssq − s²),  s = Σc, ssq = Σc² —
  // so the gate is exact (no IEEE variance whose value depends on
  // accumulation order). Counts are BIGINT; at extreme per-window
  // volumes (c ~ 1e9, n·ssq ~ 2^63) widen s/ssq to DECIMAL(38,0) —
  // same plan, wider cells.
  //
  // Scale shape: one map-side-combined count aggregate (e1's shape),
  // then a window partitioned by event_type ordered by window_start —
  // rows per partition are bounded by the stream's LIFETIME IN HOURS
  // (like e10's rank), never by event volume; the per-type sort is
  // O(#windows log #windows). In stream mode the same rule runs as a
  // trailing-state flatMapGroupsWithState keyed by type.
  private val AnomalyHist = 24
  private val AnomalyMinHist = 12
  private val AnomalyZ2 = 9 // Z = 3 standard deviations

  def e11Anomaly(spark: SparkSession, dir: String): DataFrame =
    anomaliesOf(events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("c")))

  /** The z-score rule over any (event_type, window_start, c) counts
    * frame — factored so specs can inject a known spike. */
  def anomaliesOf(counts: DataFrame): DataFrame = {
    val pw = Window.partitionBy(col("event_type")).orderBy(col("window_start"))
      .rowsBetween(-AnomalyHist, -1)
    counts
      .withColumn("hist_n", count(lit(1)).over(pw))
      .withColumn("s", sum(col("c")).over(pw))
      .withColumn("ssq", sum(col("c") * col("c")).over(pw))
      .withColumn("dev2",
        (col("hist_n") * col("c") - col("s")) * (col("hist_n") * col("c") - col("s")))
      .withColumn("var_num",
        col("hist_n") * col("ssq") - col("s") * col("s"))
      .filter(col("hist_n") >= AnomalyMinHist &&
        col("dev2") > lit(AnomalyZ2) * col("var_num"))
      .select(col("event_type"), col("window_start"), col("c").as("n_events"),
        col("hist_n"), col("dev2"), col("var_num"))
      .orderBy(col("event_type"), col("window_start"))
  }

  // DuckDB sum(BIGINT) → HUGEINT: every windowed sum is cast back to
  // BIGINT before the integer algebra (the m1/t6 type-gate class).
  lazy val e11Sql: String =
    s"""WITH counts AS (
       |  SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT event_type, window_start, c,
       |    count(*) OVER pw AS hist_n,
       |    CAST(sum(c) OVER pw AS BIGINT) AS s,
       |    CAST(sum(c * c) OVER pw AS BIGINT) AS ssq
       |  FROM counts
       |  WINDOW pw AS (PARTITION BY event_type ORDER BY window_start
       |                ROWS BETWEEN $AnomalyHist PRECEDING AND 1 PRECEDING))
       |SELECT event_type, window_start, c AS n_events, hist_n,
       |  (hist_n * c - s) * (hist_n * c - s) AS dev2,
       |  hist_n * ssq - s * s AS var_num
       |FROM w
       |WHERE hist_n >= $AnomalyMinHist
       |  AND (hist_n * c - s) * (hist_n * c - s) > $AnomalyZ2 * (hist_n * ssq - s * s)
       |ORDER BY event_type, window_start""".stripMargin

  // ---- e12: stream-static enrichment join + per-nation totals ----
  // The dimension-enrichment every event pipeline runs: the stream
  // side joins a SMALL static dim (customer → nation, broadcast) —
  // in stream mode each micro-batch hash-joins without shuffling the
  // stream and the dim is never watermarked (stream-static join
  // semantics); at 100 TB the dim broadcast is the whole cost and
  // the event scan stays narrow. Gate = the same
  // [[EventStreams.enrichedTumbling]] transform over the batch
  // table, exact-decimal sums like e1.
  def e12Enrich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val dim = broadcast(cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name")))
    EventStreams.enrichedTumbling(events(spark, dir), dim)
      .orderBy(col("window_start"), col("n_name"))
  }

  lazy val e12Sql: String =
    """SELECT date_trunc('hour', e.ts) AS window_start, n.n_name,
      |  count(*) AS n_events,
      |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2 ORDER BY window_start, n_name""".stripMargin

  // ---- e13: per-window distinct users via the mergeable HLL sketch ----
  // THE streaming cardinality question ("distinct users per hour") at
  // 100 TB: an exact per-window countDistinct expands every (window,
  // user) pair through the shuffle; the HLL register table
  // ([[graft.operators.Relational.hllRegistersOf]] — q33's machinery
  // pointed at a time window as the group) shuffles ≤ 64 pre-combined
  // register rows per partition per window, and registers from late /
  // re-processed data MERGE by cell-wise max (the q33 spec's law), so
  // the same sketch state serves an incremental micro-batch sink —
  // the sketch IS the streaming state. Gate audits the exact register
  // table, the exact-integer harmonic sum, and the one-expression
  // estimate next to the exact distinct (q33's error-band contract).
  def e13HllWindow(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val items = events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("grp"), col("user_id").as("k"))
    val exact = items.groupBy(col("grp"))
      .agg(countDistinct(col("k")).as("n_exact"))
    Relational.hllEstimateOf(Relational.hllRegistersOf(items))
      .join(exact, Seq("grp"))
      .select(col("grp").as("window_start"), col("n_exact"),
        col("n_buckets_hit"), col("max_rho"), col("s_sum"), col("hll_raw"))
      .orderBy(col("window_start"))
  }

  lazy val e13Sql: String = graft.operators.Relational.hllSqlFor(
    "events", "date_trunc('hour', ts)", "CAST(user_id AS BIGINT)",
    "window_start")

  // ---- e14: session-length distribution (the engagement report) ----
  // The report read off e3's sessionization: how long and how heavy
  // sessions are, by session-size band (singletons behave nothing
  // like 5+-event sessions — mixing them hides both). Rides the SAME
  // `EventStreams.sessions` transform the streaming runtime uses, so
  // the gate keeps validating the streaming sessionizer; then q24's
  // percentile_disc machinery (an actual data value — bit-exact, no
  // interpolation) over integer second durations. Only (band,
  // duration, n_events) triples shuffle into the percentile sort —
  // bounded by session count, never event volume; the band vocabulary
  // fixes the output at ≤ 3 rows at any scale.
  def e14SessionStats(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessions(events(spark, dir))
      .select(
        when(col("n_events") === 1, "1")
          .when(col("n_events") <= 4, "2-4").otherwise("5+").as("band"),
        (unix_timestamp(col("session_end")) - lit(1800L)
          - unix_timestamp(col("session_start"))).as("dur_sec"),
        col("n_events"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_sessions"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur_sec)")
          .cast("long").as("p50_dur_sec"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY dur_sec)")
          .cast("long").as("p90_dur_sec"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY dur_sec)")
          .cast("long").as("p99_dur_sec"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_events)")
          .cast("long").as("p90_events"))
      .orderBy(col("band"))

  // Oracle: e3's gaps-and-islands CTEs (same session rule, same
  // boundary semantics) + quantile_disc per band.
  lazy val e14Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked),
      |sess AS (
      |  SELECT user_id, session_id,
      |    date_diff('second', min(ts), max(ts)) AS dur_sec,
      |    count(*) AS n_events
      |  FROM islands GROUP BY user_id, session_id),
      |banded AS (
      |  SELECT CASE WHEN n_events = 1 THEN '1'
      |              WHEN n_events <= 4 THEN '2-4' ELSE '5+' END AS band,
      |    dur_sec, n_events
      |  FROM sess)
      |SELECT band, count(*) AS n_sessions,
      |  quantile_disc(dur_sec, 0.5) AS p50_dur_sec,
      |  quantile_disc(dur_sec, 0.9) AS p90_dur_sec,
      |  quantile_disc(dur_sec, 0.99) AS p99_dur_sec,
      |  quantile_disc(n_events, 0.9) AS p90_events
      |FROM banded GROUP BY band ORDER BY band""".stripMargin

  // ---- e15: per-window heavy-hitter sketch audit (CMS over time) ----
  // q31's count-min grid pointed at a tumbling hour, the frequency
  // sibling of e13's windowed HLL: per (window, r, bucket) cell counts
  // — ≤ d·w = 256 pre-combined rows per window through the shuffle at
  // ANY event volume, mergeable cell-wise like e13's registers (late /
  // re-processed micro-batches sum in) — audited against the exact
  // top-5 users per window via the BOUNDED top-k aggregate (q34's
  // machinery: O(5) state per window, map-side combined — an exact
  // per-window user groupBy rank would partition an unbounded user
  // vocabulary). est ≥ exact by construction; `overcount` prices the
  // d/w knobs per window. Probe ⋈ cells is a co-partitioned equi-join
  // on (window, r, bucket) — both sides bounded per window, nothing
  // broadcast that grows with stream lifetime.
  def e15CmsWindow(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    import graft.operators.Relational.{CmsRows, cmsBucket}
    val items = events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("w"),
        col("user_id").cast("long").as("k"))
    val cells = items
      .select(col("w"), col("k"), explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
      .groupBy(col("w"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val top = items.groupBy(col("w"), col("k"))
      .agg(count(lit(1)).as("exact_cnt"))
      .groupBy(col("w"))
      .agg(expr("graft_top_neighbors5(cast(exact_cnt as double), k)").as("top"))
      .select(col("w"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("w"), col("p.neighbor_id").as("k"),
        col("p.cosine").cast("long").as("exact_cnt"))
    val probes = top
      .select(col("w"), col("k"), col("exact_cnt"),
        explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
    probes.join(cells, Seq("w", "r", "bucket"))
      .groupBy(col("w"), col("k"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("w").as("window_start"), col("k").as("user_id"),
        col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("window_start"), col("user_id"))
  }

  lazy val e15Sql: String = {
    import graft.operators.Relational.{CmsRows, CmsWidth}
    s"""WITH items AS (
       |  SELECT date_trunc('hour', ts) AS w, CAST(user_id AS BIGINT) AS k
       |  FROM events),
       |cells AS (
       |  SELECT w, g.r,
       |    ((k + g.r * 131) * 2654435761) % 1000003 % $CmsWidth AS bucket,
       |    count(*) AS c
       |  FROM items, generate_series(0, ${CmsRows - 1}) g(r) GROUP BY 1, 2, 3),
       |cnt AS (SELECT w, k, count(*) AS exact_cnt FROM items GROUP BY 1, 2),
       |top AS (
       |  SELECT *, row_number() OVER (PARTITION BY w
       |    ORDER BY exact_cnt DESC, k) AS rn FROM cnt),
       |probes AS (
       |  SELECT t.w, t.k, t.exact_cnt, g.r,
       |    ((t.k + g.r * 131) * 2654435761) % 1000003 % $CmsWidth AS bucket
       |  FROM top t, generate_series(0, ${CmsRows - 1}) g(r) WHERE rn <= 5)
       |SELECT p.w AS window_start, p.k AS user_id, p.exact_cnt,
       |  min(c.c) AS cms_est, min(c.c) - p.exact_cnt AS overcount
       |FROM probes p
       |JOIN cells c ON c.w = p.w AND c.r = p.r AND c.bucket = p.bucket
       |GROUP BY 1, 2, 3 ORDER BY window_start, user_id""".stripMargin
  }

  // ---- e16: exponentially-decayed trending leaderboard ----
  // e10 ranks within one window; a live "trending now" board instead
  // wants ALL history with recency decay — score(type) =
  // Σ_events 2^(−age_hours), the half-life-per-hour exponential
  // moving count. The decay weight is EXACT INTEGER arithmetic:
  // weight = 1e6 >> age_h fixed-point micro-units (a bit shift IS
  // the power of two — no float pow to drift between engines), zero
  // past 20 hours (where the weight underflows a micro-unit, the
  // natural horizon the half-life implies). One scan with the
  // "now" anchor (the stream's max hour) broadcast as a one-row
  // aggregate, one map-side-combined sum per type — at 100 TB the
  // leaderboard costs one pass, and an incremental sink would keep
  // per-(type, hour) counts (e1's table) and fold the shift at read.
  def e16DecayedLeaderboard(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val now = e.agg(max(col("h")).as("now"))
    e.crossJoin(broadcast(now))
      .withColumn("age_h",
        expr("(unix_timestamp(now) - unix_timestamp(h)) div 3600").cast("int"))
      .withColumn("w",
        when(col("age_h") < 20, expr("shiftright(1000000L, age_h)"))
          .otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(sum(col("w")).as("decayed_micro"),
        sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_recent"))
      .filter(col("decayed_micro") > 0)
      .orderBy(col("decayed_micro").desc, col("event_type"))
  }

  lazy val e16Sql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h FROM events),
      |nw AS (SELECT max(h) AS now FROM e),
      |w AS (
      |  SELECT event_type,
      |    CASE WHEN date_diff('hour', h, now) < 20
      |         THEN 1000000 >> date_diff('hour', h, now)
      |         ELSE 0 END AS w
      |  FROM e, nw)
      |SELECT event_type, CAST(sum(w) AS BIGINT) AS decayed_micro,
      |  CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_recent
      |FROM w GROUP BY event_type
      |HAVING sum(w) > 0
      |ORDER BY decayed_micro DESC, event_type""".stripMargin

  // ---- e17: session path mining (top event-type trigrams) ----
  // The user-journey report over e3's sessions: the 10 most common
  // 3-step event-type paths taken inside one session. ONE window
  // exchange does everything — sessionization (lag + running sum of
  // new-session markers, e3's >30min gap rule) AND the two lookahead
  // steps all partition by user_id (the grow-with-data key, q27's
  // pattern), ordered by (ts, event_id) for tie determinism. Leads
  // crossing a session boundary are rejected by comparing the LED
  // session id (monotonic per user, so s3 == sid implies the middle
  // step matched too) — no second exchange on (user, session). The
  // path counts aggregate to ≤ |event_types|³ rows, so the global
  // top-10 sort is over a bounded summary, never data-sized.
  def e17SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      // micro-resolution gap test (every ts here has sub-second
      // precision — a seconds-truncated diff would disagree with the
      // oracle's INTERVAL comparison on ~boundary gaps)
      .withColumn("is_new",
        when(col("prev").isNull ||
          expr("unix_micros(ts) - unix_micros(prev)") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("sid"), 2).over(w))
      .filter(col("s3") === col("sid"))
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(10)
  }

  lazy val e17Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked),
      |tri AS (
      |  SELECT event_type || '>'
      |      || lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      || '>'
      |      || lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS path,
      |    sid,
      |    lead(sid, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
      |  FROM sess)
      |SELECT path, count(*) AS n_paths FROM tri
      |WHERE s3 = sid
      |GROUP BY path ORDER BY n_paths DESC, path LIMIT 10""".stripMargin

  // ---- e18: last-touch attribution with a lookback window ----
  // The conversion report: each purchase is credited to the user's
  // most recent PRECEDING non-purchase event, but only if it happened
  // within the 30-minute lookback — otherwise the conversion is
  // "direct". One window exchange on user_id (ordered ts, event_id):
  // two IGNORE-NULLS last_value frames over UNBOUNDED..1 PRECEDING
  // pick the same row by construction (their CASE nulls coincide), so
  // no struct column needs to cross engines. Latency is exact integer
  // microseconds; the per-channel rollup is |event_types|-bounded. The
  // same transform runs incrementally under streaming state: the
  // per-user "last touch" is O(1) state, the e6 pattern.
  def e18Attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")), true)
          .over(w))
      .withColumn("touch_ts",
        last(when(col("event_type") =!= "purchase", col("ts")), true).over(w))
      .filter(col("event_type") === "purchase")
      // exact microsecond latency (ts carries sub-second precision;
      // seconds-truncated diffs would blur the lookback boundary)
      .withColumn("lat_us",
        expr("unix_micros(ts) - unix_micros(touch_ts)"))
      .withColumn("channel",
        when(col("touch_ts").isNotNull && col("lat_us") <= 1800000000L,
          col("touch_type")).otherwise(lit("direct")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(when(col("channel") =!= "direct", col("lat_us"))).as("sum_latency_us"),
        max(when(col("channel") =!= "direct", col("lat_us"))).as("max_latency_us"))
      .orderBy(col("channel"))
  }

  lazy val e18Sql: String =
    """WITH t AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    last_value(CASE WHEN event_type != 'purchase' THEN event_type END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_type,
      |    last_value(CASE WHEN event_type != 'purchase' THEN ts END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_ts
      |  FROM events),
      |conv AS (
      |  SELECT CASE WHEN touch_ts IS NOT NULL
      |                   AND epoch_us(ts) - epoch_us(touch_ts) <= 1800000000
      |              THEN touch_type ELSE 'direct' END AS channel,
      |    CAST(epoch_us(ts) - epoch_us(touch_ts) AS BIGINT) AS lat_us
      |  FROM t WHERE event_type = 'purchase')
      |SELECT channel, count(*) AS n_conversions,
      |  CAST(sum(CASE WHEN channel != 'direct' THEN lat_us END) AS BIGINT)
      |    AS sum_latency_us,
      |  max(CASE WHEN channel != 'direct' THEN lat_us END) AS max_latency_us
      |FROM conv GROUP BY channel ORDER BY channel""".stripMargin

  // ---- e19: inactivity / churn-risk distribution ----
  // "How stale is the user base": days since each user's last event,
  // measured against the corpus' own high-water mark (e16's broadcast
  // one-row "now" anchor — no wall clock, so the result is
  // reproducible and oracle-checkable). One map-side-combined max per
  // user, one |days|-bounded rollup with the churn flag at the 7-day
  // line. Day bucketing floors MICROSECONDS (ts is sub-second); the
  // streaming form is the same O(1) per-user max state e4 keeps.
  def e19Churn(spark: SparkSession, dir: String): DataFrame = {
    val anchor = events(spark, dir).agg(max(col("ts")).as("now_ts"))
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n_events"))
      .crossJoin(broadcast(anchor))
      .withColumn("idle_days",
        expr("(unix_micros(now_ts) - unix_micros(last_ts)) div 86400000000"))
      .groupBy(col("idle_days"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
      .withColumn("churn_risk", col("idle_days") >= 7L)
      .orderBy(col("idle_days"))
  }

  lazy val e19Sql: String =
    """WITH u AS (
      |  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events
      |  FROM events GROUP BY 1),
      |a AS (SELECT max(ts) AS now_ts FROM events)
      |SELECT (epoch_us(now_ts) - epoch_us(last_ts)) // 86400000000
      |    AS idle_days,
      |  count(*) AS n_users,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  (epoch_us(now_ts) - epoch_us(last_ts)) // 86400000000 >= 7
      |    AS churn_risk
      |FROM u, a GROUP BY 1, 4 ORDER BY idle_days""".stripMargin

  // ---- e20: inter-arrival gap profile per event type ----
  // The arrival-rate gauge: per user, the microsecond gap between
  // consecutive events (any type), attributed to the LATER event's
  // type and rolled up into count / total / max / exact-median gap per
  // type. Feeds capacity planning (how bursty is each event class) and
  // anomaly baselines (e11 uses value z-scores; this is the timing
  // axis). The window partitions by user_id — a key whose cardinality
  // grows with the data, so the lag pass parallelizes at any scale —
  // and the rollup groups by the small event-type vocabulary with
  // map-side partial aggregation. Gaps are exact integer microseconds;
  // ties on ts break on event_id in both engines.
  def e20Interarrival(spark: SparkSession, dir: String): DataFrame = {
    // ordering by the integer microsecond value ≡ ordering by ts
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("total_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p50_gap_us"))
      .orderBy(col("event_type"))
  }

  lazy val e20Sql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  CAST(sum(gap_us) AS BIGINT) AS total_gap_us,
      |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
      |  CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS p50_gap_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- e21: per-user activity concentration / burst profile ----
  // Rate-limit-audit shape: bucket each user's events into hours
  // (one map-side-combined groupBy on a key that grows with the
  // data), then roll the per-user hour cells into active-hour count,
  // peak hourly rate, and peak concentration (what share of the
  // user's events land in their busiest hour, exact ppm). The burst
  // flag marks users whose peak hour crosses BurstMin — the abuse /
  // bot signal a streaming deployment alerts on (streaming form =
  // e1's tumbling count keyed by user, O(1) state per open hour).
  private val BurstMin = 3L

  def e21ActivityProfile(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_active_hours"),
        max(col("n")).as("max_per_hour"),
        sum(col("n")).as("n_events"))
      .withColumn("peak_ppm", expr("max_per_hour * 1000000 div n_events"))
      .withColumn("is_bursty", col("max_per_hour") >= BurstMin)
      .orderBy(col("user_id"))

  lazy val e21Sql: String =
    s"""WITH c AS (
       |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT user_id, count(*) AS n_active_hours,
       |  CAST(max(n) AS BIGINT) AS max_per_hour,
       |  CAST(sum(n) AS BIGINT) AS n_events,
       |  CAST(max(n) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT) AS peak_ppm,
       |  CAST(max(n) AS BIGINT) >= $BurstMin AS is_bursty
       |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- e22: out-of-order / lateness audit (watermark sizing) ----
  // The measurement that DECIDES a stream's watermark delay: replay
  // each user's events in arrival order (event_id — the append order
  // of the log), track the running max event-time, and call an event
  // late by (prev running max − ts) when it arrives behind it. The
  // per-type rollup (late count, worst and total lateness in exact
  // microseconds) is precisely the histogram one reads before picking
  // `withWatermark("ts", X)`: X must cover max_late_us or the late
  // tail drops. Window partitions by user_id (grows with data);
  // rollup is map-side combined over the small type vocabulary.
  def e22LatenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hwm", max(col("us")).over(w))
      .withColumn("late_us",
        when(col("hwm").isNull || col("hwm") <= col("us"), 0L)
          .otherwise(col("hwm") - col("us")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("total_late_us"))
      .orderBy(col("event_type"))
  }

  lazy val e22Sql: String =
    """WITH l AS (
      |  SELECT event_type,
      |    CASE WHEN hwm IS NULL OR hwm <= us THEN 0 ELSE hwm - us END AS late_us
      |  FROM (
      |    SELECT event_type, epoch_us(ts) AS us,
      |      max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |    FROM events))
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(max(late_us) AS BIGINT) AS max_late_us,
      |  CAST(sum(late_us) AS BIGINT) AS total_late_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- e23: event-type transition matrix (first-order Markov) ----
  // Per-user consecutive event-type pairs (the same user_id-keyed lag
  // window as e20 — one exchange on a grow-with-data key) rolled into
  // the (prev, next) count matrix with exact-ppm row shares. e17
  // materializes whole session PATHS; the transition matrix is its
  // O(|types|²)-bounded summary — the funnel prior, the sequence-model
  // sanity check, the anomaly baseline for "this user's next-event
  // distribution". The row-share window runs over the ≤|types|² cell
  // table — vocabulary-bounded, never data-bounded.
  def e23TypeTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val cells = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rw = Window.partitionBy(col("prev_type"))
    cells
      .withColumn("row_total", sum(col("n")).over(rw))
      .withColumn("share_ppm", expr("n * 1000000 div row_total"))
      .select(col("prev_type"), col("event_type"), col("n"), col("share_ppm"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  lazy val e23Sql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT prev_type, event_type, count(*) AS n
      |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, event_type, n,
      |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
      |    AS share_ppm
      |FROM c ORDER BY prev_type, event_type""".stripMargin

  // ---- e24: watermark what-if (allowed-lateness drop simulation) ----
  // e22 measured how late events arrive; e24 answers the follow-up a
  // stream owner actually asks: "if I set the watermark to X, how
  // much data do I drop?" Each event's lateness (e22's per-user
  // running-max rule) is tested against three candidate watermark
  // delays in one pass — the lateness rows cross-join a broadcast
  // 3-row candidate table and roll up per candidate. Read the row
  // whose drop_ppm is acceptable; that X is the
  // `withWatermark("ts", X)` to ship.
  private val WatermarkCandidatesUs = Seq(60000000L, 600000000L, 3600000000L)

  def e24WatermarkWhatif(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("hwm", max(col("us")).over(w))
      .withColumn("late_us",
        when(col("hwm").isNull || col("hwm") <= col("us"), 0L)
          .otherwise(col("hwm") - col("us")))
    val cands = WatermarkCandidatesUs
      .foldLeft(Option.empty[DataFrame]) { (acc, v) =>
        val row = spark.range(1).select(lit(v).as("wm_us"))
        Some(acc.fold(row)(_.union(row)))
      }.get
    late.crossJoin(broadcast(cands))
      .groupBy(col("wm_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > col("wm_us"), 1L).otherwise(0L)).as("n_dropped"))
      .withColumn("drop_ppm", expr("n_dropped * 1000000 div n_events"))
      .orderBy(col("wm_us"))
  }

  lazy val e24Sql: String = {
    val vals = WatermarkCandidatesUs.mkString("(", "), (", ")")
    s"""WITH l AS (
       |  SELECT CASE WHEN hwm IS NULL OR hwm <= us THEN 0 ELSE hwm - us END
       |    AS late_us
       |  FROM (
       |    SELECT epoch_us(ts) AS us,
       |      max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
       |    FROM events)),
       |c(wm_us) AS (VALUES $vals)
       |SELECT CAST(wm_us AS BIGINT) AS wm_us, count(*) AS n_events,
       |  CAST(sum(CASE WHEN late_us > wm_us THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(sum(CASE WHEN late_us > wm_us THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000 // count(*) AS drop_ppm
       |FROM l CROSS JOIN c GROUP BY wm_us ORDER BY wm_us""".stripMargin
  }

  // ---- e25: DAU / WAU / stickiness (the product-analytics gauge) ----
  // Daily active users, trailing-7-day weekly actives, and the
  // DAU/WAU stickiness ratio — the engagement dashboard every event
  // pipeline ships. The trap at scale: WAU is a distinct over a
  // 7-day range, which can't be summed from daily distincts and which
  // a range join (day grid × user-days) would execute as a nested
  // loop. Scale shape instead: reduce events to the distinct
  // (user, day) table FIRST (map-side combined — this is ≪ |events|),
  // then EXPLODE each user-day to the ≤7 future days it covers — a
  // constant 7× of the small table, pure equi-joins from there, and
  // the semi-join against observed days drops the phantom tail past
  // the stream's end. Exact integer ppm; days as 'yyyy-MM-dd' strings
  // (the q-family date convention).
  def e25DauWau(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .distinct()
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
      .orderBy(col("day"))
  }

  lazy val e25Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |cov AS (
      |  SELECT DISTINCT user_id, day + CAST(g.x AS INTEGER) AS day
      |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS x) g),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |wau AS (
      |  SELECT c.day, count(*) AS wau FROM cov c
      |  WHERE c.day IN (SELECT day FROM days) GROUP BY c.day)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
      |  d.dau * 1000000 // w.wau AS stickiness_ppm
      |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin

  // ---- e26: RFM segmentation (recency / frequency / monetary) ----
  // The classic user-value segmentation every growth team runs: per
  // user, days since last event (R), event count (F), total value in
  // exact cents (M), each coded into quintiles against corpus-wide
  // percentile_disc cut points — discrete percentiles return ACTUAL
  // data values, so every code assignment is an integer comparison
  // (no interpolated rational thresholds to disagree on). Codes are
  // 1 + |{t_i : v > t_i}| (ties land deterministically on both
  // engines); recency inverts so RECENT = 5. The user summary is one
  // map-side-combined aggregate; the 12 cut points ride a broadcast
  // one-row frame. percentile_disc buffers the summary per partition
  // — at 1e9-user scale the q29/q38 binned-rank machinery replaces
  // it (the documented high-cardinality posture).
  def e26Rfm(spark: SparkSession, dir: String): DataFrame = {
    val u = events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("monetary_cents"))
    val withR = u.crossJoin(broadcast(
        events(spark, dir).agg(max(col("ts").cast("date")).as("dmax"))))
      .withColumn("r_days", datediff(col("dmax"), col("last_day")).cast("long"))
    def cuts(c: String, out: String) = (1 to 4).map(i =>
      expr(s"percentile_disc(0.${2 * i}) WITHIN GROUP (ORDER BY $c)")
        .as(s"$out$i"))
    val th = withR.agg(
      (cuts("r_days", "rt") ++ cuts("n_events", "ft") ++
        cuts("monetary_cents", "mt")).head,
      (cuts("r_days", "rt") ++ cuts("n_events", "ft") ++
        cuts("monetary_cents", "mt")).tail: _*)
    def code(v: String, t: String) = expr(
      s"1 + (CASE WHEN $v > ${t}1 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${t}2 THEN 1 ELSE 0 END)" +
        s" + (CASE WHEN $v > ${t}3 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${t}4 THEN 1 ELSE 0 END)")
    withR.crossJoin(broadcast(th))
      .withColumn("r_code", lit(6L) - code("r_days", "rt"))
      .withColumn("f_code", code("n_events", "ft").cast("long"))
      .withColumn("m_code", code("monetary_cents", "mt").cast("long"))
      .select(col("user_id"), col("r_days"), col("n_events"),
        col("monetary_cents"), col("r_code"), col("f_code"), col("m_code"),
        (col("r_code") * 100 + col("f_code") * 10 + col("m_code")).as("rfm_code"))
      .orderBy(col("user_id"))
  }

  lazy val e26Sql: String = {
    def cuts(c: String, out: String) = (1 to 4).map(i =>
      s"quantile_disc($c, 0.${2 * i}) AS $out$i").mkString(", ")
    def code(v: String, t: String) =
      s"1 + (CASE WHEN $v > ${t}1 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${t}2 THEN 1 ELSE 0 END)" +
        s" + (CASE WHEN $v > ${t}3 THEN 1 ELSE 0 END) + (CASE WHEN $v > ${t}4 THEN 1 ELSE 0 END)"
    s"""WITH u AS (
       |  SELECT user_id, max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
       |    count(*) AS n_events,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
       |      AS monetary_cents
       |  FROM events GROUP BY user_id),
       |mx AS (SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS dmax FROM events),
       |ur AS (SELECT u.*, CAST(date_diff('day', last_day, mx.dmax) AS BIGINT)
       |         AS r_days FROM u CROSS JOIN mx),
       |th AS (SELECT ${cuts("r_days", "rt")}, ${cuts("n_events", "ft")},
       |  ${cuts("monetary_cents", "mt")} FROM ur)
       |SELECT user_id, r_days, CAST(n_events AS BIGINT) AS n_events,
       |  monetary_cents,
       |  6 - (${code("r_days", "rt")}) AS r_code,
       |  CAST(${code("n_events", "ft")} AS BIGINT) AS f_code,
       |  CAST(${code("monetary_cents", "mt")} AS BIGINT) AS m_code,
       |  (6 - (${code("r_days", "rt")})) * 100
       |    + (${code("n_events", "ft")}) * 10
       |    + (${code("monetary_cents", "mt")}) AS rfm_code
       |FROM ur CROSS JOIN th ORDER BY user_id""".stripMargin
  }

  // ---- e27: new vs returning users + cumulative user base ----
  // The growth-accounting row under e25's DAU: per day, how many
  // active users are NEW (first ever appearance) vs RETURNING, and
  // the cumulative registered-user base — the decomposition every
  // growth dashboard leads with (DAU can be flat while new-user
  // intake collapses; this table shows it). Three map-side-combined
  // aggregates — distinct (user, day) actives, min-day first-seen,
  // per-day new counts — then one running sum over the |days|-row
  // summary (the bounded-window q40 posture). All integers. In
  // stream mode first-seen IS e25's exactly-once dedup state keyed
  // by user alone — the same machinery, coarser key.
  def e27NewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val active = ud.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val fresh = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(fresh, Seq("day"), "left_outer")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("returning_users", col("active_users") - col("new_users"))
      .withColumn("cumulative_users", sum(col("new_users")).over(w))
      .select(col("day"), col("active_users"), col("new_users"),
        col("returning_users"), col("cumulative_users"))
      .orderBy(col("day"))
  }

  lazy val e27Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |act AS (SELECT day, count(*) AS active_users FROM ud GROUP BY day),
      |fs AS (SELECT day, count(*) AS new_users FROM (
      |  SELECT user_id, min(day) AS day FROM ud GROUP BY user_id) GROUP BY day)
      |SELECT a.day, a.active_users,
      |  CAST(coalesce(f.new_users, 0) AS BIGINT) AS new_users,
      |  a.active_users - CAST(coalesce(f.new_users, 0) AS BIGINT)
      |    AS returning_users,
      |  CAST(sum(coalesce(f.new_users, 0)) OVER (ORDER BY a.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
      |FROM act a LEFT JOIN fs f ON a.day = f.day
      |ORDER BY a.day""".stripMargin

  // ---- e38: growth accounting (new / resurrected / continuing) ----
  // The growth-accounting split behind every "quick ratio" chart:
  // each week's active users decompose into NEW (first event ever
  // falls in this week), RESURRECTED (prior history exists, but the
  // nearest prior event is > 3 days before this week's first
  // event — a comeback), and CONTINUING (≤ 3 days — retained).
  // e19 prices who LEFT; this prices where the actives CAME FROM.
  // Week/3-day grain because the synthetic stream spans ~30 days
  // with max per-user gap 4; a real deployment flips the constants
  // to month/30 — the plan shape is identical. Scale
  // shape: events collapse to distinct (user, day) first (the e25
  // posture), one lag window per user (key grows with data) marks
  // each day's gap to its predecessor, each user-week classifies
  // off its FIRST active day's gap (min-struct per user-week —
  // map-side combined), and the week rollup is bounded.
  // All-integer; ISO week truncation on both engines.
  def e38GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val userDays = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("gap_days",
        datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
    val firstOfMonth = userDays
      .withColumn("week", date_trunc("week", col("day")).cast("date").cast("string"))
      .groupBy(col("user_id"), col("week"))
      .agg(min(struct(col("day"), col("gap_days"))).as("s"))
      .select(col("user_id"), col("week"), col("s.gap_days").as("gap_days"))
    firstOfMonth
      .withColumn("status",
        when(col("gap_days").isNull, "new")
          .when(col("gap_days") > 3, "resurrected")
          .otherwise("continuing"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("status") === "continuing", 1L).otherwise(0L))
          .as("n_continuing"))
      .orderBy(col("week"))
  }

  lazy val e38Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    date_diff('day', lag(day) OVER (PARTITION BY user_id
      |      ORDER BY day), day) AS gap_days
      |  FROM ud),
      |fm AS (
      |  SELECT user_id, week, gap_days FROM (
      |    SELECT user_id,
      |      CAST(CAST(date_trunc('week', day) AS DATE) AS VARCHAR) AS week,
      |      gap_days,
      |      row_number() OVER (PARTITION BY user_id, date_trunc('week', day)
      |        ORDER BY day) AS rn
      |    FROM g) x WHERE rn = 1),
      |cls AS (
      |  SELECT week,
      |    CASE WHEN gap_days IS NULL THEN 'new'
      |         WHEN gap_days > 3 THEN 'resurrected'
      |         ELSE 'continuing' END AS status
      |  FROM fm)
      |SELECT week, count(*) AS n_active,
      |  CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_resurrected,
      |  CAST(sum(CASE WHEN status = 'continuing' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_continuing
      |FROM cls GROUP BY week ORDER BY week""".stripMargin

  // ---- e37: SCD2 dimension build (changelog → validity intervals) ----
  // e28 is the type-1 snapshot (latest wins, history discarded); this
  // is its type-2 sibling — the warehouse pattern that keeps EVERY
  // version with a [valid_from, valid_to) interval so any past state
  // is queryable "as of" a time. Each user's purchase events are the
  // changelog of a per-user attribute: one lead() window per user
  // (the key whose cardinality grows with data — parallel at any
  // scale) assigns each version its successor's timestamp as
  // valid_to; the open version keeps valid_to NULL with an explicit
  // is_current flag (the cleaner relational encoding of "no
  // successor": the round-7 9999-12-31 sentinel was value-correct
  // but overflows ns-ranged timestamp consumers — sentinel dates are
  // banned from gated outputs, see Verify's range guard). Ties on ts
  // break on event_id on both engines. value rides through
  // DECIMAL(18,2) (the e28 convention) so the payload compares
  // exactly.
  /** The SCD2 dimension rows, unordered — shared by the gated e37
    * build and the e40 point-in-time lookup that consumes it. */
  private[streaming] def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(18,2)").cast("double").as("value"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("ts").as("valid_from"), col("valid_to"),
        col("value"), col("valid_to").isNull.as("is_current"))
  }

  def e37Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2Dim(spark, dir).orderBy(col("user_id"), col("version"))

  lazy val e37Sql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts, event_id, value,
      |    CAST(row_number() OVER w AS BIGINT) AS version,
      |    lead(ts) OVER w AS valid_to
      |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, version, ts AS valid_from, valid_to, value,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  // ---- e40: SCD2 point-in-time lookup (dimension as-of fact time) ----
  // The consumer every SCD2 build exists for, and the join most
  // feature pipelines get wrong: enrich each fact (here the
  // non-purchase events) with the dimension attributes that were
  // valid AT its timestamp — never future state (leakage-free by
  // construction). NOT an interval join: facts and dimension-version
  // boundaries are unioned and ONE user_id-partitioned running
  // `last(ignoreNulls)` window carries the in-effect version struct
  // onto each fact row — O((F+V) log) per user after a single
  // co-shuffle on user_id, no fact×versions row blowup, the as-of
  // shape that survives a dimension with millions of versions per
  // round (the e5 pattern applied dim→fact). An event at exactly
  // valid_from sees THAT version (>= convention, matching DuckDB
  // ASOF JOIN); two versions at the same instant resolve to the
  // higher version number on both engines. Facts before the user's
  // first version keep NULL state (is_known = false), and
  // state_age_us — how stale the dimension was at fact time — is
  // exact integer µs.
  def e40Scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val st = struct(col("version"), col("valid_from"), col("value"))
    val dimRows = scd2Dim(spark, dir)
      .select(col("user_id"), col("valid_from").as("ts"), lit(0).as("tr"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"), st.as("st"))
    val factRows = events(spark, dir)
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tr"),
        col("event_id"), col("event_type"),
        lit(null).cast(
          "struct<version:bigint,valid_from:timestamp,value:double>").as("st"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tr"), col("st.version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimRows.unionByName(factRows)
      .withColumn("cur", last(col("st"), ignoreNulls = true).over(w))
      .filter(col("tr") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("cur.version").as("state_version"),
        col("cur.value").as("state_value"),
        (unix_micros(col("ts")) - unix_micros(col("cur.valid_from")))
          .as("state_age_us"),
        col("cur").isNotNull.as("is_known"))
      .orderBy(col("event_id"))
  }

  lazy val e40Sql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts AS valid_from, value,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS BIGINT) AS version
      |  FROM p),
      |-- two versions at the same instant: as-of resolves to the
      |-- higher version number (ASOF picks one row per boundary)
      |d AS (
      |  SELECT user_id, valid_from, value, version FROM v
      |  QUALIFY row_number() OVER (PARTITION BY user_id, valid_from
      |    ORDER BY version DESC) = 1),
      |f AS (
      |  SELECT event_id, user_id, ts, event_type
      |  FROM events WHERE event_type <> 'purchase')
      |SELECT f.event_id, f.user_id, f.ts, f.event_type,
      |  d.version AS state_version, d.value AS state_value,
      |  epoch_us(CAST(f.ts AS TIMESTAMP))
      |    - epoch_us(CAST(d.valid_from AS TIMESTAMP)) AS state_age_us,
      |  d.version IS NOT NULL AS is_known
      |FROM f ASOF LEFT JOIN d
      |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
      |ORDER BY event_id""".stripMargin

  // ---- e28: latest-state compaction (the CDC upsert primitive) ----
  // The log-to-snapshot operator every changelog pipeline runs: per
  // key, the LATEST row wins (here: each user's last event = their
  // current state). NOT a row_number window — the snapshot falls out
  // of ONE map-side-combined `max(struct(ts, event_id, ...))`
  // aggregate: struct ordering is lexicographic, so (ts, event_id)
  // is the version key and payload columns ride along in the same
  // struct. At 100 TB this is the difference between a full sort of
  // the log per key (window) and a combiner that keeps ONE row per
  // key per task — the compaction shape object stores use. Ties on
  // ts break on event_id deterministically on both engines.
  def e28LatestState(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").cast("double").as("value")))
        .as("s"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("s.ts").as("last_ts"),
        col("s.event_id").as("last_event_id"),
        col("s.event_type").as("last_type"),
        col("s.value").as("last_value"), col("n_versions"))
      .orderBy(col("user_id"))

  lazy val e28Sql: String =
    """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |  event_type AS last_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
      |  n_versions
      |FROM (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    count(*) OVER (PARTITION BY user_id) AS n_versions,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) x
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- e29: hour-of-week seasonality baseline (burst census) ----
  // e11 flags anomalies against a ROLLING window; e29 builds the
  // STATIC seasonal baseline that rolling detectors are calibrated
  // against: per (event_type, hour-of-week) cell, the observed count,
  // its exact-ppm share of the type's traffic, and the ratio to the
  // type's uniform per-hour mean — cells above 2× mean are flagged as
  // seasonal bursts (the "Monday 9am" load shape capacity planning
  // reads). Output is |types|·168 rows — vocabulary-bounded. Plan:
  // one map-side-combined count over the corpus, then a broadcast
  // join of the per-type totals; nothing corpus-sized shuffles twice.
  // Hour-of-week convention: Sunday 00:00 = 0 … Saturday 23:00 = 167
  // (Spark dayofweek is 1-based Sunday, DuckDB 0-based — the Spark
  // side subtracts 1 so both engines agree).
  def e29Seasonality(spark: SparkSession, dir: String): DataFrame = {
    val cells = events(spark, dir)
      .select(col("event_type"),
        ((dayofweek(col("ts")).cast("long") - 1) * 24 +
          hour(col("ts")).cast("long")).as("how"))
      .groupBy(col("event_type"), col("how"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"))
    // ratio arithmetic promotes to DECIMAL(38,0) (HUGEINT in the
    // oracle — the q61/t34 convention): n * 168e6 wraps BIGINT at
    // ~5.5e10 events per (type, hour-of-week) cell, which a 100 TB
    // log reaches
    cells.join(broadcast(totals), Seq("event_type"))
      .withColumn("share_ppm",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"))
      .withColumn("ratio_ppm",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 168 * 1000000 div total AS BIGINT)"))
      .withColumn("is_burst", col("ratio_ppm") > 2000000L)
      .select(col("event_type"), col("how"), col("n"),
        col("share_ppm"), col("ratio_ppm"), col("is_burst"))
      .orderBy(col("event_type"), col("how"))
  }

  lazy val e29Sql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(dayofweek(ts) AS BIGINT) * 24 + CAST(hour(ts) AS BIGINT) AS how,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
      |      FROM c GROUP BY 1)
      |SELECT c.event_type, c.how, c.n,
      |  CAST(CAST(c.n AS HUGEINT) * 1000000 // t.total AS BIGINT) AS share_ppm,
      |  CAST(CAST(c.n AS HUGEINT) * 168 * 1000000 // t.total AS BIGINT) AS ratio_ppm,
      |  (CAST(c.n AS HUGEINT) * 168 * 1000000 // t.total) > 2000000 AS is_burst
      |FROM c JOIN t USING (event_type)
      |ORDER BY event_type, how""".stripMargin

  // ---- e30: funnel conversion-latency distribution ----
  // e8 reports HOW MANY convert; e30 reports HOW FAST — the
  // time-to-convert distribution (first view → first qualifying
  // purchase), cohorted by the acquisition day-of-week: which intake
  // day converts fastest is the experiment readout growth teams act
  // on. Exact discrete p50/p90/p99 in microseconds (the e20/q24
  // convention — no interpolation to drift between engines), over at
  // most |converting users| rows per dow cell. Plan: two
  // map-side-combined per-user aggregates + one user_id-co-partitioned
  // join (e8's shape), then a 7-group percentile aggregate — no
  // window over corpus-sized data. Day convention: Sunday = 0
  // (e29's), pinned on both engines.
  def e30FunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    ev.filter(col("event_type") === "purchase").as("p")
      .join(firstView.as("v"),
        col("p.user_id") === col("v.user_id") && col("p.ts") >= col("v.view_ts"))
      .groupBy(col("v.user_id"), col("v.view_ts"))
      .agg(min(unix_micros(col("p.ts"))).as("purchase_us"))
      .select((dayofweek(col("view_ts")).cast("long") - 1).as("dow"),
        (col("purchase_us") - unix_micros(col("view_ts"))).as("lat_us"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us)")
          .cast("long").as("p50_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_us)")
          .cast("long").as("p90_us"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY lat_us)")
          .cast("long").as("p99_us"),
        max(col("lat_us")).as("max_us"))
      .orderBy(col("dow"))
  }

  lazy val e30Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS view_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT v.user_id, v.view_ts, min(epoch_us(CAST(p.ts AS TIMESTAMP)))
      |      AS purchase_us
      |  FROM v JOIN events p
      |    ON p.user_id = v.user_id AND p.event_type = 'purchase'
      |   AND p.ts >= v.view_ts
      |  GROUP BY v.user_id, v.view_ts),
      |l AS (
      |  SELECT CAST(dayofweek(view_ts) AS BIGINT) AS dow,
      |    purchase_us - epoch_us(CAST(view_ts AS TIMESTAMP)) AS lat_us
      |  FROM c)
      |SELECT dow, count(*) AS n_converted,
      |  CAST(quantile_disc(lat_us, 0.5) AS BIGINT) AS p50_us,
      |  CAST(quantile_disc(lat_us, 0.9) AS BIGINT) AS p90_us,
      |  CAST(quantile_disc(lat_us, 0.99) AS BIGINT) AS p99_us,
      |  CAST(max(lat_us) AS BIGINT) AS max_us
      |FROM l GROUP BY dow ORDER BY dow""".stripMargin

  // ---- e31: Markov next-event baseline accuracy (held-out) ----
  // e23 builds the transition matrix; e31 asks the question a
  // sequence model is benchmarked against: how often does "predict
  // the argmax next type" get it right on users the matrix never saw?
  // The t28 honesty pattern applied to events — a 60/40
  // multiplicative-hash split on user_id fits the transition counts
  // on train users only; each VAL user's transitions are scored
  // against the argmax prediction (tie-break: higher count, then
  // lexicographically smaller type — encoded as min(struct(−n,
  // type)) in Spark ≡ row_number ORDER BY n DESC, type in the
  // oracle). Unseen prev-types fall through the left join and count
  // as misses. Plan: the per-user lag window is e20/e23's single
  // user_id exchange; the fitted matrix is |types|²-bounded and the
  // prediction map broadcasts; accuracy rolls up map-side combined.
  def e31MarkovAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .withColumn("is_val",
        expr("((user_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 60"))
    val pred = pairs.filter(!col("is_val"))
      .groupBy(col("prev_type"), col("event_type")).agg(count(lit(1)).as("n"))
      .groupBy(col("prev_type"))
      .agg(min(struct((-col("n")).as("nn"), col("event_type").as("et"))).as("m"))
      .select(col("prev_type"), col("m.et").as("pred_type"))
    pairs.filter(col("is_val"))
      .join(broadcast(pred), Seq("prev_type"), "left_outer")
      .groupBy(col("prev_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("event_type") === col("pred_type"), 1L).otherwise(0L))
          .as("n_hit"))
      .withColumn("acc_ppm", expr("n_hit * 1000000 div n_eval"))
      .select(col("prev_type"), col("n_eval"), col("n_hit"), col("acc_ppm"))
      .orderBy(col("prev_type"))
  }

  lazy val e31Sql: String =
    """WITH p AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type,
      |    ((user_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 60
      |      AS is_val
      |  FROM events),
      |pp AS (SELECT * FROM p WHERE prev_type IS NOT NULL),
      |tr AS (SELECT prev_type, event_type, count(*) AS n
      |       FROM pp WHERE NOT is_val GROUP BY 1, 2),
      |pr AS (SELECT prev_type, event_type AS pred_type FROM (
      |         SELECT *, row_number() OVER (
      |           PARTITION BY prev_type ORDER BY n DESC, event_type) AS rn
      |         FROM tr) WHERE rn = 1)
      |SELECT pp.prev_type, count(*) AS n_eval,
      |  CAST(sum(CASE WHEN pp.event_type = pr.pred_type THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hit,
      |  CAST(sum(CASE WHEN pp.event_type = pr.pred_type THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS acc_ppm
      |FROM pp LEFT JOIN pr ON pp.prev_type = pr.prev_type
      |WHERE pp.is_val
      |GROUP BY pp.prev_type ORDER BY pp.prev_type""".stripMargin

  // ---- e32: activity streaks (gaps-and-islands on user-days) ----
  // The engagement metric behind every "7-day streak" badge: per
  // user, the longest run of CONSECUTIVE active days, plus how many
  // distinct streaks the activity fragments into. Classic
  // gaps-and-islands (q52's pattern on the behavioral axis): within a
  // user, day − row_number(day) is constant exactly along a
  // consecutive run, so grouping by that anchor splits the day set
  // into maximal streaks with no self-join. The window partitions by
  // user_id — a grows-with-data key whose per-partition row count is
  // bounded by the calendar (≤ |days| rows per user after the
  // distinct), so the sort inside each partition is trivially small
  // at any corpus size; everything after is two map-side-combined
  // aggregates. Day arithmetic runs in epoch-day integers on both
  // engines — no interval types to disagree on.
  def e32Streaks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    ud
      .withColumn("anchor",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_days"), count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  lazy val e32Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |a AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
      |  FROM ud),
      |s AS (SELECT user_id, anchor, count(*) AS len FROM a GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
      |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
      |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin

  // ---- e33: activity concentration (Lorenz deciles) ----
  // "Do 10% of users generate 90% of events?" — the Lorenz curve of
  // per-user activity, exact: users ranked by (event count asc,
  // user_id), bucketed into population deciles, each decile's share
  // of total events in exact ppm plus the cumulative share (the
  // Lorenz curve the Gini coefficient integrates). The global rank
  // uses the q29 binned-rank machinery with the count LEVEL itself
  // as the shard key: row_number partitions by n (per-level rows
  // only), exclusive running offsets accumulate over the BOUNDED
  // distinct-level table (≤ max-activity rows) and broadcast back —
  // no corpus-sized single-partition sort at any scale. Everything
  // downstream of the rank is integer arithmetic over 10 rows.
  def e33ActivityLorenz(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uc = events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val wLocal = Window.partitionBy(col("n")).orderBy(col("user_id"))
    val parts = uc.groupBy(col("n")).agg(count(lit(1)).as("c"))
    val wOff = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("n"), col("off"))
    val tot = uc.agg(count(lit(1)).as("nu"), sum(col("n")).as("ne"))
    val wCum = Window.orderBy(col("decile"))
    uc.withColumn("lr", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("(lr + off - 1) * 10 div nu"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
        max(col("ne")).as("ne"))
      .withColumn("share_ppm", expr("n_events * 1000000 div ne"))
      .withColumn("cum_events", sum(col("n_events")).over(wCum))
      .withColumn("cum_share_ppm", expr("cum_events * 1000000 div ne"))
      .select(col("decile"), col("n_users"), col("n_events"),
        col("share_ppm"), col("cum_share_ppm"))
      .orderBy(col("decile"))
  }

  lazy val e33Sql: String =
    """WITH uc AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      |p AS (SELECT n, count(*) AS c FROM uc GROUP BY 1),
      |o AS (SELECT n, CAST(coalesce(sum(c) OVER (ORDER BY n
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS off FROM p),
      |t AS (SELECT count(*) AS nu, CAST(sum(n) AS BIGINT) AS ne FROM uc),
      |r AS (SELECT uc.n,
      |        row_number() OVER (PARTITION BY uc.n ORDER BY uc.user_id)
      |          + o.off AS r
      |      FROM uc JOIN o USING (n)),
      |d AS (SELECT CAST((r - 1) * 10 // nu AS BIGINT) AS decile, n FROM r, t),
      |g AS (SELECT decile, count(*) AS n_users,
      |        CAST(sum(n) AS BIGINT) AS n_events FROM d GROUP BY 1)
      |SELECT decile, n_users, n_events,
      |  n_events * 1000000 // ne AS share_ppm,
      |  CAST(1000000 * CAST(sum(n_events) OVER (ORDER BY decile) AS BIGINT)
      |    // ne AS BIGINT) AS cum_share_ppm
      |FROM g, t ORDER BY decile""".stripMargin

  // ---- e36: bot-rate triage (superhuman cadence per user) ----
  // The abuse screen a training-data pipeline runs before trusting
  // user-generated events: per user the total volume, the distinct
  // active minutes, the burst ceiling (max events inside one minute),
  // the tightest inter-event gap in microseconds (−1 for one-event
  // users — NULL would be the only nullable gate column), and how
  // concentrated the user's behavior is on one event type (exact
  // ppm). Humans don't sustain sub-second gaps or hundred-event
  // minutes; downstream filters threshold these columns. Scale shape:
  // three user-keyed map-side-combined aggregates plus the e20 lag
  // window (partitioned by user_id — cardinality grows with data),
  // joined on user_id; one row per user, ordered by user_id.
  def e36BotScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val perMin = ev
      .groupBy(col("user_id"), (col("us") - (col("us") % 60000000L)).as("m"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("active_minutes"), max(col("k")).as("max_per_min"),
        sum(col("k")).as("n_events"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gaps = ev
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(coalesce(min(col("gap_us")), lit(-1L)).as("min_gap_us"))
    val conc = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("user_id")).agg(max(col("k")).as("top_type_n"))
    perMin.join(gaps, Seq("user_id")).join(conc, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("active_minutes"),
        col("max_per_min"), col("min_gap_us"),
        expr("top_type_n * 1000000 div n_events").as("top_type_ppm"))
      .orderBy(col("user_id"))
  }

  lazy val e36Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |pm AS (
      |  SELECT user_id, count(*) AS active_minutes, max(k) AS max_per_min,
      |    CAST(sum(k) AS BIGINT) AS n_events
      |  FROM (SELECT user_id, us - (us % 60000000) AS m, count(*) AS k
      |        FROM ev GROUP BY 1, 2) x
      |  GROUP BY user_id),
      |gp AS (
      |  SELECT user_id, COALESCE(min(gap_us), -1) AS min_gap_us
      |  FROM (SELECT user_id, us - lag(us) OVER (
      |          PARTITION BY user_id ORDER BY us, event_id) AS gap_us
      |        FROM ev) y
      |  GROUP BY user_id),
      |cc AS (
      |  SELECT user_id, max(k) AS top_type_n
      |  FROM (SELECT user_id, event_type, count(*) AS k FROM ev GROUP BY 1, 2) z
      |  GROUP BY user_id)
      |SELECT pm.user_id, pm.n_events, pm.active_minutes, pm.max_per_min,
      |  CAST(gp.min_gap_us AS BIGINT) AS min_gap_us,
      |  cc.top_type_n * 1000000 // pm.n_events AS top_type_ppm
      |FROM pm JOIN gp ON pm.user_id = gp.user_id
      |JOIN cc ON pm.user_id = cc.user_id
      |ORDER BY pm.user_id""".stripMargin

  // ---- e35: semi-structured props extraction (JSON field stats) ----
  // Every real event stream carries a JSON properties blob; the
  // first thing a pipeline does with it is pull a typed field out
  // and profile it per event type. get_json_object is the Spark-
  // native path-extraction expression (codegen'd, no UDF); the
  // oracle's json_extract_string is DuckDB's equivalent — both
  // return the unquoted scalar text, cast to BIGINT on each side.
  // Per event_type: event count, non-null k coverage, min/max/sum,
  // the exact-value median (percentile_disc — an actual data
  // element, the pinned e26 convention), and distinct users. Scale
  // shape: ONE map-side-combined aggregate over the bounded
  // event_type domain; the JSON parse is per-row work inside the
  // scan projection (pushes through whole-stage codegen, no shuffle
  // added). distinct-user count shuffles (type, user) pairs — the
  // exact-distinct posture q8 documents.
  def e35PropsStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        sum(col("k")).as("k_sum"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY k) AS BIGINT)")
          .as("k_med"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  lazy val e35Sql: String =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS k_sum,
      |  quantile_disc(CAST(json_extract_string(props, '$.k') AS BIGINT), 0.5)
      |    AS k_med,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- e34: peak session concurrency per day (interval sweep) ----
  // "How many sessions were open AT ONCE" — the capacity-planning
  // number behind every autoscaling decision, computed by the classic
  // endpoint sweep: +1 at session_start, −1 at session_end (the
  // half-open [start, end) of session_window), net deltas aggregated
  // PER TIMESTAMP first (map-side combine ⇒ the sweep's row count is
  // bounded by distinct seconds, not by session count), then a
  // running sum. The sweep is day-sharded for scale: a bounded
  // |days|-row window computes each day's carry-in (sessions still
  // open at midnight), and the within-day running max runs in a
  // day-partitioned window over ≤ 86 400 per-second rows — no global
  // single-partition ordering over the corpus, the documented
  // two-phase posture. greatest(carry, carry + max_run) covers the
  // day whose concurrency high-water is at midnight (only net-closing
  // days after a bigger carry). All-integer.
  def e34PeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val s = EventStreams.sessions(events(spark, dir))
      .select(col("session_start"), col("session_end"))
    val deltas = s.select(col("session_start").as("ts"), lit(1L).as("d"))
      .unionByName(s.select(col("session_end").as("ts"), lit(-1L).as("d")))
      .groupBy(col("ts")).agg(sum(col("d")).as("net"))
      .withColumn("day", to_date(col("ts")))
    val wprev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = deltas.groupBy(col("day")).agg(sum(col("net")).as("daynet"))
      .withColumn("carry", coalesce(sum(col("daynet")).over(wprev), lit(0L)))
      .select(col("day"), col("carry"))
    val wrun = Window.partitionBy(col("day")).orderBy(col("ts"))
    val peaks = deltas.withColumn("run", sum(col("net")).over(wrun))
      .groupBy(col("day")).agg(max(col("run")).as("max_run"))
    val starts = s.groupBy(to_date(col("session_start")).as("day"))
      .agg(count(lit(1)).as("n_sessions_started"))
    peaks.join(carry, Seq("day"))
      .join(starts, Seq("day"), "left_outer")
      .na.fill(0L, Seq("n_sessions_started"))
      .select(col("day"), col("n_sessions_started"),
        greatest(col("carry"), col("carry") + col("max_run"))
          .as("peak_concurrent"))
      .orderBy(col("day"))
  }

  lazy val e34Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked),
      |sess AS (
      |  SELECT min(ts) AS session_start,
      |    max(ts) + INTERVAL 30 MINUTE AS session_end
      |  FROM islands GROUP BY user_id, session_id),
      |d AS (SELECT ts, CAST(sum(dd) AS BIGINT) AS net FROM (
      |    SELECT session_start AS ts, 1 AS dd FROM sess
      |    UNION ALL
      |    SELECT session_end AS ts, -1 AS dd FROM sess) u
      |  GROUP BY ts),
      |dd AS (SELECT ts, net, CAST(ts AS DATE) AS day FROM d),
      |pd AS (SELECT day, CAST(sum(net) AS BIGINT) AS daynet
      |       FROM dd GROUP BY day),
      |cr AS (SELECT day,
      |         COALESCE(CAST(sum(daynet) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS BIGINT), 0) AS carry
      |       FROM pd),
      |pk AS (SELECT day, CAST(max(run) AS BIGINT) AS max_run FROM (
      |         SELECT day, sum(net) OVER (PARTITION BY day ORDER BY ts)
      |           AS run FROM dd) r
      |       GROUP BY day),
      |st AS (SELECT CAST(session_start AS DATE) AS day, count(*) AS n
      |       FROM sess GROUP BY 1)
      |SELECT pk.day, CAST(COALESCE(st.n, 0) AS BIGINT) AS n_sessions_started,
      |  greatest(cr.carry, cr.carry + pk.max_run) AS peak_concurrent
      |FROM pk JOIN cr ON pk.day = cr.day
      |LEFT JOIN st ON pk.day = st.day
      |ORDER BY pk.day""".stripMargin

  // ---- e39: day-over-day value drift per event type ----
  // The metric-health monitor behind every revenue dashboard: per
  // (event_type, day), exact volume/total/median of `value`, plus
  // the day-over-day deltas a drift alert fires on (a p50 jump with
  // flat volume = pricing change or instrumentation bug; volume jump
  // with flat p50 = traffic mix shift). Money in integer cents (the
  // e28 DECIMAL convention), the median via percentile_disc (an
  // actual data value, bit-exact — the e14/q24 machinery). The lag
  // window runs over the BOUNDED (type, day) summary (≤ |types|·
  // |days| rows), never over events — the documented two-phase
  // posture; the corpus-sized work is one map-side-combined
  // aggregate. First day per type is dropped (no predecessor).
  def e39ValueDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
          .cast("long").as("p50_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("prev_p50", lag(col("p50_cents"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("sum_cents"), col("p50_cents"),
        (col("n") - col("prev_n")).as("n_delta"),
        (col("p50_cents") - col("prev_p50")).as("p50_drift_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  lazy val e39Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS sum_cents,
      |    CAST(quantile_disc(CAST(CAST(value AS DECIMAL(18,2)) * 100
      |      AS BIGINT), 0.5) AS BIGINT) AS p50_cents
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT *, lag(n) OVER w AS prev_n, lag(p50_cents) OVER w AS prev_p50
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n, sum_cents,
      |  p50_cents, n - prev_n AS n_delta,
      |  p50_cents - prev_p50 AS p50_drift_cents
      |FROM lagged WHERE prev_n IS NOT NULL
      |ORDER BY event_type, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e39_value_drift" -> (e39ValueDrift _),
    "e34_peak_concurrency" -> (e34PeakConcurrency _),
    "e35_props_stats" -> (e35PropsStats _),
    "e36_bot_score" -> (e36BotScore _),
    "e37_scd2" -> (e37Scd2 _),
    "e40_scd2_lookup" -> (e40Scd2Lookup _),
    "e38_growth_accounting" -> (e38GrowthAccounting _),
    "e28_latest_state" -> (e28LatestState _),
    "e29_seasonality" -> (e29Seasonality _),
    "e30_funnel_latency" -> (e30FunnelLatency _),
    "e31_markov_accuracy" -> (e31MarkovAccuracy _),
    "e32_streaks" -> (e32Streaks _),
    "e33_activity_lorenz" -> (e33ActivityLorenz _),
    "e27_new_vs_returning" -> (e27NewVsReturning _),
    "e26_rfm" -> (e26Rfm _),
    "e25_dau_wau" -> (e25DauWau _),
    "e24_watermark_whatif" -> (e24WatermarkWhatif _),
    "e23_type_transitions" -> (e23TypeTransitions _),
    "e22_lateness_audit" -> (e22LatenessAudit _),
    "e21_activity_profile" -> (e21ActivityProfile _),
    "e20_interarrival" -> (e20Interarrival _),
    "e19_churn" -> (e19Churn _),
    "e18_attribution" -> (e18Attribution _),
    "e17_session_paths" -> (e17SessionPaths _),
    "e16_decayed_leaderboard" -> (e16DecayedLeaderboard _),
    "e15_cms_window" -> (e15CmsWindow _),
    "e14_session_stats" -> (e14SessionStats _),
    "e13_hll_window" -> (e13HllWindow _),
    "e12_enrich" -> (e12Enrich _),
    "e11_anomaly" -> (e11Anomaly _),
    "e10_trending" -> (e10Trending _),
    "e9_cohort_retention" -> (e9CohortRetention _),
    "e1_tumbling_agg" -> (e1TumblingAgg _),
    "e2_sliding_agg" -> (e2SlidingAgg _),
    "e3_sessionize" -> (e3Sessionize _),
    "e4_stream_dedup" -> (e4StreamDedup _),
    "e5_asof_join" -> (e5AsofJoin _),
    "e6_custom_sessions" -> (e6CustomSessions _),
    "e7_stream_join" -> (e7StreamJoin _),
    "e8_funnel" -> (e8Funnel _))

  val oracles: Map[String, String] = Map(
    "e28_latest_state" -> e28Sql,
    "e29_seasonality" -> e29Sql,
    "e30_funnel_latency" -> e30Sql,
    "e31_markov_accuracy" -> e31Sql,
    "e32_streaks" -> e32Sql,
    "e33_activity_lorenz" -> e33Sql,
    "e39_value_drift" -> e39Sql,
    "e34_peak_concurrency" -> e34Sql,
    "e35_props_stats" -> e35Sql,
    "e36_bot_score" -> e36Sql,
    "e37_scd2" -> e37Sql,
    "e40_scd2_lookup" -> e40Sql,
    "e38_growth_accounting" -> e38Sql,
    "e27_new_vs_returning" -> e27Sql,
    "e26_rfm" -> e26Sql,
    "e25_dau_wau" -> e25Sql,
    "e24_watermark_whatif" -> e24Sql,
    "e23_type_transitions" -> e23Sql,
    "e22_lateness_audit" -> e22Sql,
    "e21_activity_profile" -> e21Sql,
    "e20_interarrival" -> e20Sql,
    "e19_churn" -> e19Sql,
    "e18_attribution" -> e18Sql,
    "e17_session_paths" -> e17Sql,
    "e16_decayed_leaderboard" -> e16Sql,
    "e15_cms_window" -> e15Sql,
    "e14_session_stats" -> e14Sql,
    "e13_hll_window" -> e13Sql,
    "e12_enrich" -> e12Sql,
    "e11_anomaly" -> e11Sql,
    "e10_trending" -> e10Sql,
    "e9_cohort_retention" -> e9Sql,
    "e1_tumbling_agg" -> e1Sql,
    "e2_sliding_agg" -> e2Sql,
    "e3_sessionize" -> e3Sql,
    "e4_stream_dedup" -> e4Sql,
    "e5_asof_join" -> e5Sql,
    "e6_custom_sessions" -> e3Sql,
    "e7_stream_join" -> e7Sql,
    "e8_funnel" -> e8Sql)
}
