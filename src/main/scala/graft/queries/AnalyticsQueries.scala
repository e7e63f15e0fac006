package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Exact
import graft.operators.AsOf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced-analytics extension queries: temporal joins (as-of, banded
  * self-join), multi-dimensional rollups (CUBE), and grouped top-k — the
  * operations an analyst of the reference's time-series output runs next,
  * each expressed in the scalable Spark shape and each carrying a DuckDB
  * oracle (DuckDB's native ASOF JOIN / inequality join / CUBE re-derive the
  * semantics independently).
  *
  * Determinism: ranking and banding use only exact values (integer-valued
  * doubles, epoch µs, BIGINT ids) per the QueryDef rules, so cross-engine
  * hash compare is exact — fractional-double sums are snapped where emitted.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** 5 minutes in µs: the event-pair band and the bucket width (equal by
    * construction — see q_event_pairs).
    */
  private val BandUs = 300000000L

  /** Shared DuckDB CTE prefix for the two resample queries: `e` (events with
    * µs timestamps + hour buckets), `hv` (deterministic last-in-hour value),
    * `bounds`/`grid` (each user's own [min,max] hourly grid). A fix to the
    * in-hour dedup ordering or the grid step lands in BOTH oracles at once.
    */
  private val resampleGridCte: String =
    """WITH e AS (
      |  SELECT event_id, user_id, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hr_us
      |  FROM events),
      |hv AS (
      |  SELECT user_id, hr_us, value FROM (
      |    SELECT user_id, hr_us, value,
      |      row_number() OVER (PARTITION BY user_id, hr_us
      |                         ORDER BY ts_us DESC, event_id DESC) AS rn
      |    FROM e) WHERE rn = 1),
      |bounds AS (SELECT user_id, min(hr_us) AS h0, max(hr_us) AS h1 FROM e GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, 3600000000)) AS hr_us
      |  FROM bounds)""".stripMargin

  /** Spark twin of [[resampleGridCte]]: each user's hourly grid left-joined
    * with their deterministic last-in-hour value (`value` NULL on empty
    * slots). Both resample queries fill the gaps their own way on top.
    */
  private def resampleGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
      .select($"event_id", $"user_id", $"value",
        unix_micros($"ts").as("ts_us"),
        unix_micros(date_trunc("hour", $"ts")).as("hr_us"))
    val lastInHour = Window.partitionBy($"user_id", $"hr_us")
      .orderBy($"ts_us".desc, $"event_id".desc)
    val hv = e.withColumn("rn", row_number().over(lastInHour))
      .where($"rn" === 1).select($"user_id", $"hr_us", $"value")
    val grid = e.groupBy($"user_id")
      .agg(min($"hr_us").as("h0"), max($"hr_us").as("h1"))
      .select($"user_id",
        explode(sequence($"h0", $"h1", lit(3600000000L))).as("hr_us"))
    grid.join(hv, Seq("user_id", "hr_us"), "left")
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Per-user behavioral feature rollup — the feature-engineering pass a
    // model-input pipeline runs over an event log: activity volume, event-
    // type breadth, distinct active days (calendar dates in the UTC session
    // — the q_calendar convention), value total (order-free 1e-12-quantized
    // decimal sum — Exact.pico12, r12 — snapped only as output formatting),
    // and first/last activity as exact µs instants. ONE
    // partial-agg shuffle keyed on user_id; at 100 TB this is the cheapest
    // possible per-entity featurization shape.
    QueryDef(
      "q_user_features",
      Some("""SELECT user_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
             |  FLOOR(CAST(SUM(CAST(FLOOR(value * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 * 1000000 + 0.5) / 1000000 AS total_value,
             |  epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS first_us,
             |  epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS last_us
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").groupBy($"user_id").agg(
          count(lit(1)).as("n_events"),
          countDistinct($"event_type").as("n_types"),
          countDistinct(to_date($"ts")).as("n_days"),
          (floor(Exact.sum12($"value") * lit(1000000)
            + lit(0.5)) / lit(1000000))
            .as("total_value"),
          unix_micros(min($"ts")).as("first_us"),
          unix_micros(max($"ts")).as("last_us"))
      }),

    // ------------------------------------------------------------------
    // Daily-active-users timeseries with a trailing 7-day rolling DAU —
    // the ops heartbeat of any event pipeline. Calendar dates in the UTC
    // session (the q_calendar convention); the rolling window is a RANGE
    // frame over epoch days, so gap days correctly shrink the trailing
    // count instead of the frame silently sliding over them. One date agg
    // shuffle + one unpartitioned-but-tiny window (one row per calendar
    // day, bounded by the horizon, never by event volume).
    QueryDef(
      "q_daily_active",
      Some("""WITH d AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
             |    CAST(COUNT(*) AS BIGINT) AS n_events
             |  FROM events GROUP BY 1)
             |SELECT day, dau, n_events,
             |  CAST(SUM(dau) OVER (ORDER BY CAST(epoch(CAST(day AS TIMESTAMP)) AS BIGINT) / 86400
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS dau_7d_sum
             |FROM d""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"))
          .agg(countDistinct($"user_id").as("dau"),
            count(lit(1)).as("n_events"))
        val w = Window
          .orderBy(unix_date($"day"))
          .rangeBetween(-6, Window.currentRow)
        d.select($"day", $"dau", $"n_events",
          sum($"dau").over(w).as("dau_7d_sum"))
      }),

    // ------------------------------------------------------------------
    // Hour-of-day seasonality profile per event type — the load-shape
    // feature behind capacity planning and the seasonal baseline anomaly
    // rules compare against. UTC-session hours (the q_calendar
    // convention); counts exact, the one double mean snapped. One
    // partial-agg shuffle over a 24 × types result.
    QueryDef(
      "q_hourly_profile",
      Some("""SELECT CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hour_of_day,
             |  event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  FLOOR(CAST(SUM(CAST(FLOOR(value * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 / COUNT(*) * 1000000 + 0.5) / 1000000 AS avg_value
             |FROM events GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(hour($"ts").as("hour_of_day"), $"event_type")
          .agg(count(lit(1)).as("n_events"),
            (floor(Exact.sum12($"value") / count(lit(1))
              * lit(1000000) + lit(0.5))
              / lit(1000000)).as("avg_value"))
      }),

    // ------------------------------------------------------------------
    // Metric anomaly detection: events whose value sits more than 3σ from
    // their type's mean — the scalar sibling of q_embed_outliers and the
    // first alert rule an ops pipeline wires. Same determinism recipe:
    // per-type moments snap to 1e-6 FIRST so the z arithmetic is
    // IEEE-identical cross-engine (the 3σ comparison then agrees
    // everywhere), sd floors at 1e-12 against constant-valued types.
    // One partial-agg moments pass broadcast back over a map-only filter.
    QueryDef(
      "q_value_anomaly",
      Some("""WITH m AS (
             |  SELECT event_type,
             |    FLOOR(AVG(value) * 1000000 + 0.5) / 1000000 AS mu,
             |    GREATEST(FLOOR(STDDEV_SAMP(value) * 1000000 + 0.5) / 1000000, 1e-12) AS sd
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |  FLOOR(ABS((e.value - m.mu) / m.sd) * 1000000 + 0.5) / 1000000 AS z
             |FROM events e JOIN m USING (event_type)
             |WHERE ABS((e.value - m.mu) / m.sd) > 3.0""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val snap = (x: org.apache.spark.sql.Column) =>
          floor(x * lit(1000000) + lit(0.5)) / lit(1000000)
        val m = t(s, dir, "events").groupBy($"event_type").agg(
          snap(avg($"value")).as("mu"),
          greatest(snap(stddev_samp($"value")), lit(1e-12)).as("sd"))
        val z = abs(($"value" - $"mu") / $"sd")
        t(s, dir, "events")
          .join(broadcast(m), Seq("event_type"))
          .where(z > 3.0)
          .select($"event_id", $"event_type", $"value", snap(z).as("z"))
      }),

    // ------------------------------------------------------------------
    // MAD-based robust outliers — q_value_anomaly's necessary counterpart:
    // the z-score's own μ/σ are dragged by the very outliers it hunts
    // (masking — one 1e9 reading inflates σ until nothing is 3σ out),
    // while median/MAD have a 50% breakdown point. Modified z =
    // 0.6745·(x − med)/MAD, flag |Mz| > 3.5 (the Iglewicz–Hoaglin
    // convention). Two exact-percentile passes by nature (the deviation
    // needs the median first): each is a per-type agg to a FEW-ROW
    // relation broadcast back over a map-only pruned re-scan — no window
    // ever sorts the event stream. med and MAD snap 1e-6 FIRST (the
    // q_value_anomaly discipline) so all downstream arithmetic is
    // IEEE-identical cross-engine; MAD floors at 1e-12 against
    // constant-valued types.
    QueryDef(
      "q_robust_zscore",
      Some("""WITH m AS (
             |  SELECT event_type,
             |    FLOOR(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS med
             |  FROM events GROUP BY 1),
             |d AS (
             |  SELECT e.event_id, e.event_type, e.value, m.med,
             |    ABS(e.value - m.med) AS ad
             |  FROM events e JOIN m USING (event_type)),
             |md AS (
             |  SELECT event_type,
             |    GREATEST(FLOOR(quantile_cont(ad, 0.5) * 1000000 + 0.5) / 1000000,
             |             1e-12) AS mad
             |  FROM d GROUP BY 1)
             |SELECT d.event_id, d.event_type, d.value,
             |  FLOOR(ABS(0.6745 * (d.value - d.med) / md.mad) * 1000000 + 0.5)
             |    / 1000000 AS mz
             |FROM d JOIN md USING (event_type)
             |WHERE ABS(0.6745 * (d.value - d.med) / md.mad) > 3.5""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val snap = (x: org.apache.spark.sql.Column) =>
          floor(x * lit(1000000) + lit(0.5)) / lit(1000000)
        val m = t(s, dir, "events").groupBy($"event_type")
          .agg(snap(expr("percentile(value, 0.5)")).as("med"))
        val d = t(s, dir, "events")
          .join(broadcast(m), Seq("event_type"))
          .select($"event_id", $"event_type", $"value", $"med",
            abs($"value" - $"med").as("ad"))
        val md = d.groupBy($"event_type")
          .agg(greatest(snap(expr("percentile(ad, 0.5)")), lit(1e-12))
            .as("mad"))
        val mz = abs(lit(0.6745) * ($"value" - $"med") / $"mad")
        d.join(broadcast(md), Seq("event_type"))
          .where(mz > 3.5)
          .select($"event_id", $"event_type", $"value", snap(mz).as("mz"))
      }),

    // ------------------------------------------------------------------
    // Cohort retention matrix: users grouped by first-activity ISO week,
    // counted in each later week they reappear — the standard retention
    // triangle. Both engines truncate to Monday (ISO) in the UTC session;
    // week offsets are exact integer day-diffs / 7 (Monday-to-Monday is
    // always divisible). Two shuffles: the per-user first-week agg and the
    // cohort×offset count — both partial-agg friendly. All-integer/date
    // outputs, no float drift.
    QueryDef(
      "q_retention_cohorts",
      Some("""WITH e AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
             |  FROM events),
             |f AS (
             |  SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY 1)
             |SELECT f.cohort_week,
             |  CAST(datediff('day', f.cohort_week, e.wk) / 7 AS INT) AS week_offset,
             |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN f USING (user_id)
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .select($"user_id",
            date_trunc("week", $"ts").cast("date").as("wk"))
          .distinct()
        val f = e.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
        e.join(f, Seq("user_id"))
          .groupBy($"cohort_week",
            (datediff($"wk", $"cohort_week") / 7).cast("int").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
      }),

    // ------------------------------------------------------------------
    // Event-type transition matrix: per-user time-ordered lag pairs
    // counted into (prev, next) cells — the first-order Markov features of
    // behavioral modeling and the input to anomaly rules ("checkout with
    // no cart"). Order is total (µs instant + event_id tie-break, the
    // repo-wide window convention) so the lag relation is deterministic in
    // both engines. One user-keyed window shuffle + one partial-agg count;
    // all-integer outputs.
    QueryDef(
      "q_event_transitions",
      Some("""WITH o AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type, event_type AS next_type,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM o WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        t(s, dir, "events")
          .select($"user_id", $"event_type",
            lag($"event_type", 1).over(w).as("prev_type"))
          .where($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type".as("next_type"))
          .agg(count(lit(1)).as("n"))
      }),

    // ------------------------------------------------------------------
    // As-of join: each click joined to the user's most recent purchase at or
    // before it (attribution lookup). Spark side is AsOf.joinAsOf (union +
    // one-shuffle window carry-forward); DuckDB's native ASOF LEFT JOIN is
    // the independent oracle. Purchases are pre-deduped to one row per
    // (user, ts) — with ties, which row wins is unspecified in ANY engine.
    QueryDef(
      "q_asof_join",
      Some("""WITH l AS (
             |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events WHERE event_type = 'click'),
             |r AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             |         max(event_id) AS ref_purchase
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT l.event_id, l.user_id, l.ts_us,
             |       r.ts_us AS ts_us_right, r.ref_purchase,
             |       l.ts_us - r.ts_us AS wait_us
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
            $"event_type")
        val clicks = e.where($"event_type" === "click").drop("event_type")
        val purchases = e.where($"event_type" === "purchase")
          .groupBy($"user_id", $"ts_us")
          .agg(max($"event_id").as("ref_purchase"))
        AsOf.joinAsOf(clicks, purchases, key = "user_id", ts = "ts_us",
            carryCols = Seq("ref_purchase"))
          .withColumn("wait_us", $"ts_us" - $"ts_us_right")
          .select($"event_id", $"user_id", $"ts_us", $"ts_us_right",
            $"ref_purchase", $"wait_us")
      }),

    // ------------------------------------------------------------------
    // Banded self-join: ordered pairs of same-user events within 5 minutes
    // (co-occurrence mining). The naive form is an inequality self-join that
    // Spark can only plan as a per-user cartesian; the scalable form buckets
    // ts to the band width so |t_b - t_a| <= B implies bucket(b) ∈
    // {bucket(a), bucket(a)+1} — explode the EARLIER side into those two
    // buckets and the join becomes a pure equi-join on (user, bucket), with
    // the band + ordering re-checked as a cheap post-filter. Each pair is
    // found exactly once (the two candidate buckets are distinct). 2×
    // row duplication on one side buys a hash join instead of a cartesian —
    // the trade that survives 100 TB.
    QueryDef(
      "q_event_pairs",
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events)
             |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
             |       b.ts_us - a.ts_us AS dt_us
             |FROM e a JOIN e b
             |  ON a.user_id = b.user_id
             | AND b.ts_us - a.ts_us BETWEEN 0 AND $BandUs
             | AND (a.ts_us < b.ts_us
             |      OR (a.ts_us = b.ts_us AND a.event_id < b.event_id))""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
          .withColumn("bk", floor($"ts_us" / BandUs))
        val a = e.select($"user_id", $"event_id".as("id_a"),
            $"ts_us".as("ts_a"),
            explode(array($"bk", $"bk" + 1)).as("bk"))
        val b = e.select($"user_id", $"event_id".as("id_b"),
          $"ts_us".as("ts_b"), $"bk")
        a.join(b, Seq("user_id", "bk"))
          .where(($"ts_b" - $"ts_a").between(0, BandUs) &&
            ($"ts_a" < $"ts_b" || ($"ts_a" === $"ts_b" && $"id_a" < $"id_b")))
          .select($"user_id", $"id_a", $"id_b", ($"ts_b" - $"ts_a").as("dt_us"))
      }),

    // ------------------------------------------------------------------
    // Hopping (sliding) window: 1-hour windows every 30 minutes — each
    // event lands in exactly 2 overlapping windows. Spark's window()
    // generator does the 1→2 expansion inline (no shuffle until the agg);
    // the oracle derives the same two window starts arithmetically
    // (floor-to-slide minus {0, slide}) and UNION ALLs them. Counts exact;
    // value sums aggregate 1e-12-quantized decimals (Exact.pico12, r12),
    // the 2-decimal snap is output formatting only.
    QueryDef(
      "q_window_hopping",
      Some("""WITH e AS (
             |  SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events),
             |x AS (
             |  SELECT event_type, value, ts_us - ts_us % 1800000000 AS w FROM e
             |  UNION ALL
             |  SELECT event_type, value, ts_us - ts_us % 1800000000 - 1800000000 FROM e)
             |SELECT w AS window_start_us, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  FLOOR(CAST(SUM(CAST(FLOOR(value * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 * 100.0 + 0.5) / 100.0 AS sum_value
             |FROM x GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
          .agg(count(lit(1)).as("n_events"),
            (floor(Exact.sum12($"value") * 100.0 + 0.5)
              / 100.0).as("sum_value"))
          .select(unix_micros($"window.start").as("window_start_us"),
            $"event_type", $"n_events", $"sum_value")
      }),

    // ------------------------------------------------------------------
    // Time-weighted average — the correct mean for irregularly-sampled
    // meter readings (a plain AVG over-weights bursts): Σ vᵢ·Δtᵢ / Σ Δtᵢ
    // with Δt from lead(). One window + one agg on the same key = the
    // window's sort carries into the agg, single shuffle. Δt is exact
    // integer µs; the v·Δt numerator sums 1e-12-quantized decimals
    // (Exact.pico12, r12 — order-free, so the ratio is bit-identical
    // cross-engine) and the 1e-6 snap is output formatting only.
    QueryDef(
      "q_time_weighted",
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
             |  FROM events),
             |d AS (
             |  SELECT user_id, value,
             |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS dt
             |  FROM e)
             |SELECT user_id,
             |  CAST(SUM(dt) AS BIGINT) AS total_us,
             |  FLOOR(CAST(SUM(CAST(FLOOR(value * 1e12 + 0.5) AS DECIMAL(38,0)) * dt) AS DOUBLE) / 1e12 / SUM(dt) * 1000000 + 0.5) / 1000000 AS twa
             |FROM d WHERE dt IS NOT NULL
             |GROUP BY 1 HAVING SUM(dt) > 0""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        t(s, dir, "events")
          .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
          .withColumn("dt", lead($"ts_us", 1).over(w) - $"ts_us")
          .where($"dt".isNotNull)
          .groupBy($"user_id")
          .agg(sum($"dt").as("total_us"),
            // quantize the VALUE, then weight by the exact integer dt —
            // the product stays exact decimal and never needs its own
            // quantization (which would overflow pico12's long floor)
            sum(Exact.pico12($"value") * $"dt").cast("double").as("num"))
          .where($"total_us" > 0)
          .select($"user_id", $"total_us",
            (floor($"num" / lit(1e12) / $"total_us" * 1000000.0 + 0.5)
              / 1000000.0).as("twa"))
      }),

    // ------------------------------------------------------------------
    // Resample + forward-fill: snap each user's readings to an hourly grid
    // (their own [min,max] hour range via sequence()+explode — generated
    // distributed, never on the driver) and carry the last observation
    // forward through empty hours. "Last in hour" is picked by a
    // deterministic (ts, event_id) DESC row_number — not first()/last()
    // aggregates, whose result is partition-order luck. Values pass through
    // untouched (single row's double, no accumulation) → exact compare.
    // The gap-fill window rides the same (user, hour) sort as the grid
    // join, and the first grid slot always has a reading (the grid starts
    // AT the first observation's hour), so no leading NULLs.
    QueryDef(
      "q_resample_ffill",
      Some(s"""$resampleGridCte
             |SELECT g.user_id, g.hr_us,
             |  last_value(hv.value IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.hr_us
             |    ROWS UNBOUNDED PRECEDING) AS value_ffill
             |FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hr_us = hv.hr_us""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ffill = Window.partitionBy($"user_id").orderBy($"hr_us")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        resampleGrid(s, dir)
          .select($"user_id", $"hr_us",
            last($"value", ignoreNulls = true).over(ffill).as("value_ffill"))
      }),

    // ------------------------------------------------------------------
    // Linear-interpolation resample — the sibling of q_resample_ffill for
    // signals where holding the last reading is wrong (temperatures, not
    // counters): empty grid slots get prev + (next−prev)·Δt-ratio from the
    // surrounding samples. Same grid join; the backward neighbor rides an
    // ASC running frame and the forward neighbor a DESC running frame (two
    // O(n) sorts — see the builder comment for why an UnboundedFollowing
    // frame is the O(n²) trap). The grid
    // spans [first, last] observation hours, both of which hold samples, so
    // prev/next always exist for interior gaps; sample rows keep their own
    // value (the formula's 0/0 case). Interp = the SAME IEEE expression
    // tree in both engines (integer-µs ratio, one multiply, one add) —
    // bit-exact per QueryDef determinism rules, emitted raw.
    QueryDef(
      "q_resample_interp",
      Some(s"""$resampleGridCte,
             |j AS (
             |  SELECT g.user_id, g.hr_us, hv.value,
             |    last_value(hv.value IGNORE NULLS) OVER w_back AS prev_v,
             |    last_value(CASE WHEN hv.value IS NOT NULL THEN g.hr_us END IGNORE NULLS)
             |      OVER w_back AS prev_t,
             |    first_value(hv.value IGNORE NULLS) OVER w_fwd AS next_v,
             |    first_value(CASE WHEN hv.value IS NOT NULL THEN g.hr_us END IGNORE NULLS)
             |      OVER w_fwd AS next_t
             |  FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hr_us = hv.hr_us
             |  WINDOW
             |    w_back AS (PARTITION BY g.user_id ORDER BY g.hr_us ROWS UNBOUNDED PRECEDING),
             |    w_fwd AS (PARTITION BY g.user_id ORDER BY g.hr_us
             |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, hr_us,
             |  CASE WHEN value IS NOT NULL THEN value
             |       ELSE prev_v + (next_v - prev_v) *
             |            (CAST(hr_us - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
             |  END AS value_interp
             |FROM j""".stripMargin),
      (s, dir) => {
        import s.implicits._
        // the forward neighbor comes from a REVERSED-order running frame,
        // not a (currentRow, unboundedFollowing) frame: Spark's
        // UnboundedFollowing window frame re-scans the partition tail for
        // EVERY row — O(n²) per user (measured 12.8s vs 1.3s at sf0.1).
        // On DESC order, last(ignoreNulls) over unboundedPreceding..current
        // is the nearest at-or-after sample, accumulated incrementally;
        // the price is a second O(n) sort, not a quadratic frame.
        val wBack = Window.partitionBy($"user_id").orderBy($"hr_us")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFwdRev = Window.partitionBy($"user_id").orderBy($"hr_us".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        resampleGrid(s, dir)
          .select($"user_id", $"hr_us", $"value",
            last($"value", ignoreNulls = true).over(wBack).as("prev_v"),
            last(when($"value".isNotNull, $"hr_us"), ignoreNulls = true)
              .over(wBack).as("prev_t"),
            last($"value", ignoreNulls = true).over(wFwdRev).as("next_v"),
            last(when($"value".isNotNull, $"hr_us"), ignoreNulls = true)
              .over(wFwdRev).as("next_t"))
          .select($"user_id", $"hr_us",
            when($"value".isNotNull, $"value")
              .otherwise($"prev_v" + ($"next_v" - $"prev_v") *
                (($"hr_us" - $"prev_t").cast("double") /
                  ($"next_t" - $"prev_t").cast("double")))
              .as("value_interp"))
      }),

    // ------------------------------------------------------------------
    // CUBE over (returnflag, linestatus): all 4 grouping sets in ONE pass —
    // Spark expands grouping sets inside a single hash aggregate (one
    // shuffle), vs 4 separate scans. Quantity sums are exact (integer-valued
    // doubles); price sums snapped to their true 2-decimal precision.
    QueryDef(
      "q_cube",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  SUM(l_quantity) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum($"l_quantity").as("sum_qty"),
            // exact order-free decimal sum — the post-sum FLOOR snap's
            // drift margin broke on the grand-total cell at 6M rows
            // (CoreQueries.exactSum rationale)
            sum($"l_extendedprice".cast("decimal(38,2)")).cast("double")
              .as("sum_price"))
      }),

    // ------------------------------------------------------------------
    // Pivot: linestatus values rotated into columns via the relational
    // pivot surface (Spark lowers it to grouped conditional aggregates —
    // one hash agg, no extra pass). DuckDB oracle uses FILTER aggregates:
    // the portable spelling of the same semantics. Explicit pivot values
    // ('F','O') keep the plan static — at 100 TB an implicit pivot would
    // run a distinct-scan job just to discover column names. A pivot cell
    // with NO input rows is NULL even for count (the agg never runs) while
    // SQL's COUNT FILTER is 0 — coalesce reconciles the convention.
    QueryDef(
      "q_pivot",
      Some("""SELECT l_returnflag,
             |  SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
             |  SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o,
             |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_f,
             |  CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_o
             |FROM lineitem GROUP BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum($"l_quantity").as("qty"), count(lit(1)).as("n"))
          .select($"l_returnflag",
            $"F_qty".as("qty_f"), $"O_qty".as("qty_o"),
            coalesce($"F_n", lit(0L)).as("n_f"),
            coalesce($"O_n", lit(0L)).as("n_o"))
      }),

    // ------------------------------------------------------------------
    // Unpivot (wide → long): three measure columns melted to (metric, value)
    // rows via stack() — a generator, not a join: 3× rows, zero shuffle,
    // stays inside whole-stage codegen. Values pass through untouched
    // (per-row doubles are IEEE-exact), oracle is the UNION ALL spelling.
    QueryDef(
      "q_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM lineitem""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber",
          expr("stack(3, 'qty', l_quantity, 'price', l_extendedprice, " +
            "'disc', l_discount) as (metric, value)"))
      }),

    // ------------------------------------------------------------------
    // Conversion funnel: ordered signup → click → purchase per user, each
    // step's timestamp constrained to be at or after the previous step's.
    // Sequential dependency means 3 chained (filter → agg → join) stages —
    // each stage's right side is one row per qualifying user (≪ events), so
    // AQE broadcasts the step tables and the event scan stays the only big
    // input. Times are exact µs minima → deterministic cross-engine.
    QueryDef(
      "q_funnel_steps",
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
             |  FROM events),
             |u AS (SELECT DISTINCT user_id FROM e),
             |s1 AS (SELECT user_id, min(ts_us) AS t_signup FROM e
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e
             |       JOIN s1 ON e.user_id = s1.user_id
             |       WHERE e.event_type = 'click' AND e.ts_us >= s1.t_signup GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e
             |       JOIN s2 ON e.user_id = s2.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts_us >= s2.t_click GROUP BY 1)
             |SELECT u.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
             |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
             |            WHEN s2.t_click IS NOT NULL THEN 2
             |            WHEN s1.t_signup IS NOT NULL THEN 1
             |            ELSE 0 END AS INT) AS stage
             |FROM u
             |LEFT JOIN s1 USING (user_id)
             |LEFT JOIN s2 USING (user_id)
             |LEFT JOIN s3 USING (user_id)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
        val users = e.select($"user_id").distinct()
        val s1 = e.where($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts_us").as("t_signup"))
        val s2 = e.join(s1, "user_id")
          .where($"event_type" === "click" && $"ts_us" >= $"t_signup")
          .groupBy($"user_id").agg(min($"ts_us").as("t_click"))
        val s3 = e.join(s2, "user_id")
          .where($"event_type" === "purchase" && $"ts_us" >= $"t_click")
          .groupBy($"user_id").agg(min($"ts_us").as("t_purchase"))
        users
          .join(s1, Seq("user_id"), "left")
          .join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .withColumn("stage",
            when($"t_purchase".isNotNull, 3)
              .when($"t_click".isNotNull, 2)
              .when($"t_signup".isNotNull, 1)
              .otherwise(0))
      }),

    // ------------------------------------------------------------------
    // Bivariate statistics: Pearson correlation + least-squares regression
    // per group, one pass (both engines lower these to single-pass
    // co-moment aggregates — no second scan, normal partial-agg shuffle).
    // Snap scales follow the drift analysis: corr/r² are normalized to
    // [-1,1] (relative drift ~1e-10 → 1e-6 snap), slope ~covar/var ~ O(10)
    // (1e-4), intercept ~O(5e4) with ~1e-6 absolute drift (1e-2 snap).
    // Raw co-moment sums (Σxy, Σx²...) are deliberately NOT emitted: at
    // 600k rows their accumulated drift exceeds any usable snap precision.
    QueryDef(
      "q_corr_regr",
      Some("""SELECT l_returnflag,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  FLOOR(corr(l_quantity, l_extendedprice) * 1000000 + 0.5) / 1000000 AS corr_qp,
             |  FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000 + 0.5) / 10000 AS slope,
             |  FLOOR(regr_intercept(l_extendedprice, l_quantity) * 100 + 0.5) / 100 AS icept,
             |  FLOOR(regr_r2(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000 AS r2
             |FROM lineitem GROUP BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            (floor(corr($"l_quantity", $"l_extendedprice") * 1000000.0 + 0.5)
              / 1000000.0).as("corr_qp"),
            (floor(regr_slope($"l_extendedprice", $"l_quantity") * 10000.0 + 0.5)
              / 10000.0).as("slope"),
            (floor(regr_intercept($"l_extendedprice", $"l_quantity") * 100.0 + 0.5)
              / 100.0).as("icept"),
            (floor(regr_r2($"l_extendedprice", $"l_quantity") * 1000000.0 + 0.5)
              / 1000000.0).as("r2"))
      }),

    // ------------------------------------------------------------------
    // Deterministic stratified sampling: 2 orders per customer, selected by
    // md5 of the key — a seedless, engine-independent pseudo-random order
    // (identical hex in both engines, so the SAMPLE ITSELF is oracle-exact,
    // unlike rand()-based sampling which no two engines can agree on).
    // row_number<=k again plans as WindowGroupLimit: each partition keeps
    // its local top-2 before the shuffle, so the full per-customer ordering
    // never materializes — the shape that makes stratified sampling viable
    // on a 100 TB fact table.
    QueryDef(
      "q_sample_stratified",
      Some("""SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(md5($"o_orderkey".cast("string").cast("binary")), $"o_orderkey")
        t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey")
          .withColumn("rn", row_number().over(w))
          .where($"rn" <= 2)
      }),

    // ------------------------------------------------------------------
    // RANGE-framed window: trailing 1-hour sum/count per user — the frame
    // is bounded by the ORDER-BY VALUE (event time), not a row count, so
    // bursty users aggregate a genuinely different set than q_moving_avg's
    // ROWS frame. Same one-shuffle window shape; the frame CONTENT is
    // deterministic (exact µs bounds), the sum inside it aggregates
    // 1e-12-quantized decimals (Exact.pico12, r12) with the 2-decimal snap
    // as output formatting.
    QueryDef(
      "q_range_window",
      Some("""WITH e AS (
             |  SELECT event_id, user_id, value,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events)
             |SELECT event_id, user_id, ts_us,
             |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
             |  FLOOR(CAST(SUM(CAST(FLOOR(value * 1e12 + 0.5) AS DECIMAL(38,0))) OVER w AS DOUBLE) / 1e12 * 100.0 + 0.5) / 100.0 AS sum_1h
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts_us")
          .rangeBetween(-3600000000L, Window.currentRow)
        t(s, dir, "events")
          .select($"event_id", $"user_id", $"value", unix_micros($"ts").as("ts_us"))
          .select($"event_id", $"user_id", $"ts_us",
            count(lit(1)).over(w).as("n_1h"),
            (floor(sum(Exact.pico12($"value")).over(w).cast("double")
              / lit(1e12) * 100.0 + 0.5) / 100.0).as("sum_1h"))
      }),

    // ------------------------------------------------------------------
    // Bucketized interval join (AsOf.intervalJoin): per purchase, the
    // user's clicks inside its preceding-hour attribution window. A bare
    // range predicate between two relations plans as a nested-loop; the
    // operator quantizes time into 1-hour buckets, explodes each interval
    // over the ≤2 buckets it touches, equi-joins on (user, bucket), and
    // exact-filters the survivors — output |true matches| + boundary slop,
    // never O(|points|·|intervals|). The oracle says what it means (the
    // plain range join DuckDB's IEJoin handles); AsOfSpec pins the no-
    // nested-loop plan and brute-force equality. Left semantics restored
    // by re-joining the purchase set; window is [ts−1h, ts) exclusive so
    // the purchase itself never self-counts.
    QueryDef(
      "q_interval_join",
      Some("""WITH p AS (
             |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  CAST(count(c.ts_us) AS BIGINT) AS n_clicks_1h
             |FROM p LEFT JOIN c ON c.user_id = p.user_id
             |  AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us < p.ts_us
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select($"event_id", $"user_id", $"event_type",
            unix_micros($"ts").as("ts_us"))
        val p = ev.where($"event_type" === "purchase")
          .select($"event_id", $"user_id",
            ($"ts_us" - 3600000000L).as("start_us"), $"ts_us".as("end_us"))
        val c = ev.where($"event_type" === "click")
          .select($"user_id", $"ts_us".as("click_us"))
        val hits = AsOf.intervalJoin(c, p, "click_us", "start_us", "end_us",
            bucketWidth = 3600000000L, keyCols = Seq("user_id"))
          .groupBy($"event_id", $"user_id")
          .agg(count(lit(1)).as("n_clicks_1h"))
        p.select($"event_id", $"user_id")
          .join(hits, Seq("event_id", "user_id"), "left")
          .select($"event_id", $"user_id",
            coalesce($"n_clicks_1h", lit(0L)).as("n_clicks_1h"))
      }),

    // ------------------------------------------------------------------
    // Privacy prep for training on behavioral logs: q_pii_scrub cleans
    // free text; this anonymizes the STRUCTURED side. Keyed
    // pseudonymization (md5 over a pepper — a literal here, a secret in
    // production — same id ⇒ same pseudonym, so per-user sequence
    // structure survives for modeling while raw ids never leave),
    // timestamp generalized to the hour, and k-anonymity suppression on
    // the (event_type, hour) quasi-identifier: any row in a group
    // smaller than k=5 gets its type masked, because a lone "purchase at
    // 3am on the 14th" re-identifies regardless of the pseudonym. One
    // window shuffle on the quasi-identifier; everything else map-only.
    QueryDef(
      "q_pseudonymize",
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS hour_us
             |  FROM events),
             |g AS (
             |  SELECT event_id, user_id, event_type, hour_us,
             |    CAST(count(*) OVER (PARTITION BY event_type, hour_us) AS BIGINT) AS n
             |  FROM e)
             |SELECT event_id,
             |  'u_' || substr(md5('pepper:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudonym,
             |  CASE WHEN n < 5 THEN '*' ELSE event_type END AS event_type_anon,
             |  hour_us,
             |  n < 5 AS suppressed
             |FROM g""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .select($"event_id", $"user_id", $"event_type",
            unix_micros(date_trunc("hour", $"ts")).as("hour_us"))
        val n = count(lit(1)).over(
          Window.partitionBy($"event_type", $"hour_us"))
        e.withColumn("n", n)
          .select($"event_id",
            concat(lit("u_"), substring(
              md5(concat(lit("pepper:"), $"user_id")), 1, 12)).as("pseudonym"),
            when($"n" < 5, "*").otherwise($"event_type").as("event_type_anon"),
            $"hour_us",
            ($"n" < 5).as("suppressed"))
      }),

    // ------------------------------------------------------------------
    // Full outer join — both-sided preservation: customers with only urgent
    // orders, only low-priority orders, or both (the two pre-aggregations
    // make each side unique on the key, so the join is 1:1 and both NULL
    // fringes are genuinely exercised). Shuffle on the shared key; both
    // agg exchanges reuse the same partitioning.
    QueryDef(
      "q_join_full_outer",
      Some("""WITH u AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_urgent
             |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
             |l AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_low
             |  FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1)
             |SELECT COALESCE(u.o_custkey, l.o_custkey) AS custkey,
             |       u.n_urgent, l.n_low
             |FROM u FULL OUTER JOIN l ON u.o_custkey = l.o_custkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val urgent = o.where($"o_orderpriority" === "1-URGENT")
          .groupBy($"o_custkey".as("uk")).agg(count(lit(1)).as("n_urgent"))
        val low = o.where($"o_orderpriority" === "5-LOW")
          .groupBy($"o_custkey".as("lk")).agg(count(lit(1)).as("n_low"))
        urgent.join(low, $"uk" === $"lk", "full_outer")
          .select(coalesce($"uk", $"lk").as("custkey"), $"n_urgent", $"n_low")
      }),

    // ------------------------------------------------------------------
    // Correlated EXISTS subquery — exercises Catalyst's decorrelation
    // (RewritePredicateSubquery lowers it to a left-semi hash join; the
    // correlated predicate becomes the join condition, no per-row re-scan).
    // Same answer shape as an explicit semi-join, but through the SQL
    // subquery surface a reference user would actually write.
    QueryDef(
      "q_exists_subquery",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey, c_name FROM customer c
                 WHERE EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT')""")
      }),

    // ------------------------------------------------------------------
    // Correlated SCALAR subquery — per-row max over the same key.
    // Catalyst decorrelates to an aggregate + join (one extra scan of
    // orders, shared shuffle key), never a per-row re-execution; rows tying
    // the per-customer max are kept by BOTH engines (= semantics), so the
    // result is exact without tie-breaking.
    QueryDef(
      "q_scalar_subquery",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
             |WHERE o_totalprice = (
             |  SELECT max(o2.o_totalprice) FROM orders o2
             |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin),
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
                 WHERE o_totalprice = (
                   SELECT max(o2.o_totalprice) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey)""")
      }),

    // ------------------------------------------------------------------
    // Running DISTINCT count over a window — COUNT(DISTINCT) OVER is not
    // supported by either engine, so both spell the standard relational
    // rewrite: flag each (user, type)'s FIRST occurrence (row_number = 1
    // over the secondary window), then running-sum the flags over the
    // primary one. Two window passes sharing one user-keyed shuffle; both
    // orders are total (ts, event_id) → exact.
    QueryDef(
      "q_window_distinct",
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, ts_us,
             |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
             |                                 ORDER BY ts_us, event_id) = 1
             |         THEN 1 ELSE 0 END AS first_seen
             |  FROM e)
             |SELECT event_id, user_id, ts_us,
             |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
             |FROM f""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val byUserType = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts_us", $"event_id")
        val running = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select($"event_id", $"user_id", $"event_type",
            unix_micros($"ts").as("ts_us"))
          .withColumn("first_seen",
            when(row_number().over(byUserType) === 1, 1L).otherwise(0L))
          .select($"event_id", $"user_id", $"ts_us",
            sum($"first_seen").over(running).as("n_distinct_types"))
      }),

    // ------------------------------------------------------------------
    // Map-typed columns: per-row map construction and key lookup. The map
    // never reaches the output (engines disagree on map cell rendering and
    // extraction types — DuckDB map extraction yields a LIST); only scalar
    // lookups are emitted, which is also the pattern that keeps map columns
    // prunable at scale.
    QueryDef(
      "q_map_ops",
      Some("""SELECT l_orderkey, l_linenumber,
             |  map_extract(map(['qty', 'disc'], [l_quantity, l_discount]), 'qty')[1] AS qty_via_map,
             |  map_extract(map(['qty', 'disc'], [l_quantity, l_discount]), 'disc')[1] AS disc_via_map,
             |  CAST(cardinality(map(['qty', 'disc'], [l_quantity, l_discount])) AS INT) AS map_size
             |FROM lineitem""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val m = map(lit("qty"), $"l_quantity", lit("disc"), $"l_discount")
        t(s, dir, "lineitem").select(
          $"l_orderkey", $"l_linenumber",
          element_at(m, "qty").as("qty_via_map"),
          element_at(m, "disc").as("disc_via_map"),
          size(m).as("map_size"))
      }),

    // ------------------------------------------------------------------
    // ANSI-safe casts: TRY_CAST yields NULL (not a runtime error, not a
    // garbage value) on unparseable strings and on numeric overflow — the
    // engine-wide NULL-not-garbage convention at the cast surface. Both
    // failure modes are exercised deterministically.
    QueryDef(
      "q_try_cast",
      // (doc_id % 1000): the overflow the query DEMONSTRATES must live in
      // the CAST (INT range), never in the long multiply feeding it —
      // try_cast does not guard its operand, and ANSI long multiply threw
      // for real at the sf10 ladder's shifted id domain (ids ≈ 10⁹ ×
      // 10¹¹ > Long.Max). The bounded form is id-domain-safe to 10¹⁵ in
      // both engines and still exceeds INT range for every non-zero value.
      Some("""SELECT doc_id,
             |  TRY_CAST(substr(text, 1, 1) AS INT) AS first_char_int,
             |  TRY_CAST(doc_id % 1000 * 100000000000 AS INT) AS overflow_int,
             |  TRY_CAST(substr(text, 1, 4) AS DOUBLE) AS prefix_double
             |FROM documents""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents").selectExpr(
          "doc_id",
          "try_cast(substr(text, 1, 1) AS INT) AS first_char_int",
          "try_cast(doc_id % 1000 * 100000000000 AS INT) AS overflow_int",
          "try_cast(substr(text, 1, 4) AS DOUBLE) AS prefix_double")),

    // ------------------------------------------------------------------
    // Ranking-function family: ntile / percent_rank / cume_dist / dense_rank
    // over one shared window — Spark evaluates all four in a single Window
    // operator pass (one sort, one shuffle). Total order (qty, orderkey)
    // makes every rank value deterministic; percent_rank and cume_dist are
    // small exact rationals (k/n with n≤bucket size) → safe to emit raw.
    QueryDef(
      "q_rank_family",
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  CAST(dense_rank() OVER w AS INT) AS drnk,
             |  percent_rank() OVER w AS prnk,
             |  cume_dist() OVER w AS cdist
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
        t(s, dir, "orders").select(
          $"o_custkey", $"o_orderkey",
          ntile(4).over(w).as("quartile"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
      }),

    // ------------------------------------------------------------------
    // Collect-aggregate family: set/list aggregation per group. Raw
    // collect_list order is partition-arrival luck in EVERY engine, so the
    // deterministic spelling is sort-after-collect — emitted as a joined
    // string because the external compare cannot order array cells.
    // array_sort(collect_set(x)) ≡ list_sort(list_distinct(list(x))).
    QueryDef(
      "q_array_agg",
      Some("""SELECT l_returnflag,
             |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
             |  CAST(len(list_distinct(list(l_partkey % 10))) AS INT) AS n_pk_mod,
             |  array_to_string(list_sort(list_distinct(list(CAST(l_linenumber AS VARCHAR)))), ',') AS linenos
             |FROM lineitem GROUP BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            array_join(array_sort(collect_set($"l_linestatus")), ",").as("statuses"),
            size(collect_set($"l_partkey" % 10)).as("n_pk_mod"),
            array_join(array_sort(collect_set($"l_linenumber".cast("string"))), ",")
              .as("linenos"))
      }),

    // ------------------------------------------------------------------
    // Explicit GROUPING SETS (not derivable from cube/rollup): two
    // single-column sets + grand total in one Expand pass, with
    // grouping_id() disambiguating "NULL because aggregated" from "NULL in
    // the data" — both engines use the same bit convention (1 = column
    // aggregated away, ordered by the grouping column list).
    QueryDef(
      "q_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  SUM(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
            $"l_returnflag", $"l_linestatus")
          .agg(grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            sum($"l_quantity").as("sum_qty"))
          .select($"l_returnflag", $"l_linestatus", $"gid", $"n", $"sum_qty")
      }),

    // ------------------------------------------------------------------
    // Calendar arithmetic: month addition (end-of-month clamped identically
    // in both engines — verified on day>=29 dates), last-day snap, quarter,
    // day deltas. All exact calendar integers/instants, no floats anywhere.
    QueryDef(
      "q_date_arith",
      Some("""SELECT o_orderkey,
             |  o_orderdate + INTERVAL 3 MONTH AS plus3mo,
             |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
             |  CAST(quarter(o_orderdate) AS INT) AS qtr,
             |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k
             |FROM orders""".stripMargin),
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select(
          $"o_orderkey",
          add_months($"o_orderdate", 3).cast("timestamp").as("plus3mo"),
          last_day($"o_orderdate").cast("timestamp").as("eom"),
          quarter($"o_orderdate").as("qtr"),
          datediff(lit("2000-01-01").cast("date"), $"o_orderdate").as("days_to_y2k"))
      }),

    // ------------------------------------------------------------------
    // Grouped top-k: 3 highest-quantity parts per returnflag. Ranking metric
    // is an exact sum (integer-valued doubles) with a total tiebreak, so the
    // cut is deterministic cross-engine. rank<=k over a window plans as
    // WindowGroupLimit in Spark 4: the per-partition top-k is pre-pruned
    // BEFORE the shuffle, so the full ranked set never materializes.
    QueryDef(
      "q_topk_group",
      Some("""WITH r AS (
             |  SELECT l_returnflag, l_partkey, SUM(l_quantity) AS qty
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, l_partkey, qty, rnk FROM (
             |  SELECT *, CAST(ROW_NUMBER() OVER (
             |    PARTITION BY l_returnflag ORDER BY qty DESC, l_partkey) AS INT) AS rnk
             |  FROM r)
             |WHERE rnk <= 3""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val byPart = t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_partkey")
          .agg(sum($"l_quantity").as("qty"))
        val w = Window.partitionBy($"l_returnflag")
          .orderBy($"qty".desc, $"l_partkey")
        byPart.withColumn("rnk", row_number().over(w))
          .where($"rnk" <= 3)
      }),

    // ------------------------------------------------------------------
    // SCD Type-2 merge — [[graft.etl.Maintenance.scdMerge]]: customers as
    // the initial snapshot (one open version each), a deterministic orders
    // slice as the update feed (multiple observations per key, ties on
    // equal dates broken by the attr value in BOTH engines). Unchanged
    // re-observations (same SEG on a later date) must NOT cut a version —
    // the compression leg is what the oracle certifies hardest.
    QueryDef(
      "q_scd2",
      Some("""WITH base AS (
             |  SELECT c_custkey, c_mktsegment AS segment, DATE '1990-01-01' AS valid_from
             |  FROM customer),
             |upd AS (
             |  SELECT o_custkey AS c_custkey,
             |         'SEG' || CAST(o_orderkey % 3 AS VARCHAR) AS segment,
             |         o_orderdate AS valid_from
             |  FROM orders WHERE o_custkey % 10 = 0),
             |stacked AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
             |marked AS (
             |  SELECT *,
             |    lag(segment) OVER (PARTITION BY c_custkey ORDER BY valid_from, segment) AS prev_seg,
             |    (row_number() OVER (PARTITION BY c_custkey ORDER BY valid_from, segment) > 1) AS has_prev
             |  FROM stacked),
             |surv AS (
             |  SELECT c_custkey, segment, valid_from FROM marked
             |  WHERE NOT (has_prev AND prev_seg IS NOT DISTINCT FROM segment)),
             |fin AS (
             |  SELECT c_custkey, segment, valid_from,
             |    lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from, segment) AS valid_to
             |  FROM surv)
             |SELECT c_custkey, segment, valid_from, valid_to,
             |  (valid_to IS NULL) AS is_current
             |FROM fin""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "customer").select(
          $"c_custkey",
          $"c_mktsegment".as("segment"),
          to_date(lit("1990-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(true).as("is_current"))
        val updates = t(s, dir, "orders").where($"o_custkey" % 10 === 0)
          .select($"o_custkey".as("c_custkey"),
            concat(lit("SEG"), ($"o_orderkey" % 3).cast("string")).as("segment"),
            $"o_orderdate".as("eff_date"))
        graft.etl.Maintenance.scdMerge(base, updates,
          Seq("c_custkey"), Seq("segment"), "eff_date")
      }),

    // ------------------------------------------------------------------
    // CDC apply — [[graft.etl.Maintenance.applyCdc]]: orders as a change
    // feed over the customer snapshot (o_orderkey = the unique LSN;
    // latest-per-key wins entirely; % 4 keys delete). Per-row values only
    // (no sums) → exact cross-engine hash.
    QueryDef(
      "q_cdc_apply",
      Some("""WITH ch AS (
             |  SELECT o_custkey AS c_custkey,
             |         'cdc_' || CAST(o_orderkey AS VARCHAR) AS c_name,
             |         o_totalprice AS c_acctbal,
             |         CASE WHEN o_orderkey % 4 = 0 THEN 'D' ELSE 'U' END AS op,
             |         o_orderkey AS seq
             |  FROM orders),
             |latest AS (
             |  SELECT c_custkey, c_name, c_acctbal, op FROM (
             |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
             |    FROM ch) WHERE rn = 1)
             |SELECT b.c_custkey, b.c_name, b.c_acctbal
             |FROM customer b
             |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = b.c_custkey)
             |UNION ALL
             |SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "customer")
          .select($"c_custkey", $"c_name", $"c_acctbal")
        val changes = t(s, dir, "orders").select(
          $"o_custkey".as("c_custkey"),
          concat(lit("cdc_"), $"o_orderkey".cast("string")).as("c_name"),
          $"o_totalprice".as("c_acctbal"),
          when($"o_orderkey" % 4 === 0, "D").otherwise("U").as("op"),
          $"o_orderkey".as("seq"))
        graft.etl.Maintenance.applyCdc(base, changes,
          Seq("c_custkey"), "op", "seq")
      })
  )
}
