package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: tumbling-window
  * aggregation, sessionization (gaps-and-islands) and as-of join.
  *
  * These are the batch twins of the Structured Streaming pipelines in
  * `graft.streaming` — same logical shapes, same results on a static
  * table. The reference has no streaming at all (SURVEY §0), so this
  * whole module is part of the training-data-pipeline surface.
  *
  * Scale notes: every operator here partitions by `user_id` (or window
  * start) before any per-row work — at 100 TB the shuffle is one
  * hash-exchange on a high-cardinality key and all window functions run
  * partition-local. No driver-side collection anywhere.
  */
object EventOps {

  import Exact.dsum

  /** Tumbling 1-hour window aggregation keyed by event_type. */
  def windowAgg(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"))

  val windowAggOracle: String = """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
      event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type"""

  /** Hourly active users: exact COUNT(DISTINCT user_id) (plus
    * distinct event types) per tumbling hour. Spark plans multiple
    * distinct aggregates via Expand + two-phase aggregation — the
    * partial phase dedups (hour, user) pairs map-side, so the
    * exchange carries the distinct pairs, not raw events. At 100 TB
    * the exact form is right when hour×user cardinality is bounded
    * (it is: users/hour ≤ active population); the HLL escape hatch
    * for unbounded-cardinality groups is [[StatsOps.approxDistinct]]'s
    * shape. */
  def hourlyUsers(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"))

  val hourlyUsersOracle: String = """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
      COUNT(*) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY date_trunc('hour', ts)"""

  /** HOPPING (sliding) 1-hour window every 15 minutes, keyed by
    * event_type — each event lands in 4 overlapping windows
    * (`functions.window` with a slide). The fan-out is the constant
    * window/slide ratio, applied row-locally before the one aggregation
    * shuffle, so the shape scales exactly like the tumbling op. The
    * oracle replays the same alignment arithmetic (windows are
    * epoch-aligned: start ≡ 0 mod slide, start ≤ ts < start + width). */
  def windowHopping(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("event_type"), col("n"), col("total_value"))

  val windowHoppingOracle: String = """
    WITH e AS (
      SELECT event_type, value, epoch_ms(ts) AS ts_ms,
        unnest(range(0, 4)) AS k
      FROM events)
    SELECT CAST((ts_ms // 900000) * 900000 - k * 900000 AS BIGINT) AS w_start_ms,
      event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM e
    WHERE (ts_ms // 900000) * 900000 - k * 900000 > ts_ms - 3600000
    GROUP BY 1, 2"""

  /** Sessionization: a session breaks after a 30-minute silence per
    * user (gaps-and-islands via window functions). */
  def sessionize(sp: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Engine.table(sp, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // millisecond epochs floor identically on both engines (DuckDB
      // epoch_ms / Spark unix_millis); second-level epochs would round
      // vs floor differently at sub-second precision.
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        dsum(col("value")).as("session_value"))
  }

  val sessionizeOracle: String = """
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
          THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, value,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
      epoch_ms(MIN(ts)) AS session_start_ms,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered GROUP BY user_id, session_seq"""

  /** As-of join: for every click event, the value of that user's most
    * recent purchase at-or-before the click.
    *
    * Implemented scalably as union + partition-local window (one
    * shuffle on user_id; no inequality join). The oracle uses the
    * naive O(n·m) formulation — same semantics. */
  def asofJoin(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("value").as("pv"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("double").as("pv"), col("event_id"))
    // tag orders purchases before clicks at an identical timestamp so
    // "at-or-before" is inclusive.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase_value", last(col("pv"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("last_purchase_value"))
  }

  val asofJoinOracle: String = """
    SELECT c.event_id, c.user_id, max_by(p.value, p.ts) AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id AND p.ts <= c.ts
    GROUP BY c.event_id, c.user_id"""

  /** NEAREST-direction as-of join (pandas merge_asof
    * direction='nearest'): each click paired with the temporally
    * CLOSEST purchase of the same user in either direction, ties to
    * the earlier purchase. Same union + window shape as [[asofJoin]]
    * — both sides share one exchange on user_id and the backward
    * (last at-or-before) and forward (first at-or-after) passes reuse
    * the same sort order, so the inequality never becomes a join
    * condition. Determinism: the window orders (ms, tag, event_id) —
    * equal-millisecond purchases resolve by id identically on both
    * engines; a same-ms purchase sorts BEFORE the click (tag 0 < 1),
    * lands in the backward frame with delta 0, and wins any tie. */
  def asofNearest(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("tag"),
        col("event_id"))
    val pms = when(col("tag") === 0, col("ms"))
    val pid = when(col("tag") === 0, col("event_id"))
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("tag"), col("event_id"))
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val takePrev = col("next_id").isNull ||
      (col("prev_id").isNotNull &&
        col("ms") - col("prev_ms") <= col("next_ms") - col("ms"))
    ev
      .withColumn("prev_ms", last(pms, ignoreNulls = true).over(wB))
      .withColumn("prev_id", last(pid, ignoreNulls = true).over(wB))
      .withColumn("next_ms", first(pms, ignoreNulls = true).over(wF))
      .withColumn("next_id", first(pid, ignoreNulls = true).over(wF))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        when(takePrev, col("prev_id")).otherwise(col("next_id"))
          .as("nearest_purchase_id"),
        when(takePrev, col("prev_ms") - col("ms"))
          .otherwise(col("next_ms") - col("ms")).as("delta_ms"))
  }

  val asofNearestOracle: String = """
    WITH u AS (
      SELECT user_id, epoch_ms(ts) AS ms,
        CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        event_id
      FROM events WHERE event_type IN ('click', 'purchase')),
    w AS (
      SELECT user_id, ms, tag, event_id,
        last_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS) OVER wb AS prev_ms,
        last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS) OVER wb AS prev_id,
        first_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS) OVER wf AS next_ms,
        first_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS) OVER wf AS next_id
      FROM u
      WINDOW
        wb AS (PARTITION BY user_id ORDER BY ms, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY ms, tag, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
      CASE WHEN next_id IS NULL OR (prev_id IS NOT NULL
                AND ms - prev_ms <= next_ms - ms)
           THEN prev_id ELSE next_id END AS nearest_purchase_id,
      CASE WHEN next_id IS NULL OR (prev_id IS NOT NULL
                AND ms - prev_ms <= next_ms - ms)
           THEN prev_ms - ms ELSE next_ms - ms END AS delta_ms
    FROM w WHERE tag = 1"""

  /** Range (interval) join: every purchase paired with the same
    * user's clicks within ±15 minutes — the operator class Spark has
    * no native support for (SURVEY: as-of/range joins are custom).
    *
    * Scale-safe shape: band both sides into 15-minute buckets, explode
    * the smaller side to its 3 adjacent buckets, equi-join on
    * (user_id, bucket), then apply the exact range predicate. The
    * naive |purchases|×|clicks| theta product never forms — candidate
    * volume is bucket-local, the standard interval-join banding. */
  def rangeJoin(sp: SparkSession, dir: String): DataFrame = {
    val WMs = 900000L // 15 minutes
    val ev = Engine.table(sp, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_millis(col("ts")).as("p_ms"))
      .withColumn("bucket", explode(array(
        floor(col("p_ms") / WMs) - 1,
        floor(col("p_ms") / WMs),
        floor(col("p_ms") / WMs) + 1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_millis(col("ts")).as("c_ms"))
      .withColumn("bucket", floor(col("c_ms") / WMs))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(abs(col("c_ms") - col("p_ms")) <= WMs)
      .select(col("purchase_id"), col("click_id"),
        (col("c_ms") - col("p_ms")).as("delta_ms"))
  }

  val rangeJoinOracle: String = """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      epoch_ms(c.ts) - epoch_ms(p.ts) AS delta_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND abs(epoch_ms(c.ts) - epoch_ms(p.ts)) <= 900000"""

  /** Stage window for the funnel ops (1 hour, in ms). The window
    * predicate is evaluated on MILLISECOND epochs on BOTH engines:
    * the raw timestamps are nanos that Spark sees µs-truncated
    * (Engine.table) while DuckDB sees in full, so a comparison on raw
    * timestamp values is a sub-µs tie hazard — ms flooring commutes
    * with min() and is the proven shared precision (same discipline
    * as sessionize/rangeJoin). */
  val FunnelWindowMs = 3600000L

  /** Two-step funnel: per user with at least one click, did a
    * purchase land within one hour of the FIRST click, and how many.
    * The funnel predicate is a range, but the plan is a pure
    * equi-join: aggregate first-click per user (one shuffle), equi-
    * join purchases on user_id, apply the window as a post-filter —
    * the inequality never becomes a join condition, so no theta/
    * cartesian shape at any scale. */
  def funnel(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
    // cached: one row per clicking user — the conversion join AND the
    // final left join both read it; uncached, the events scan + filter
    // + aggregate ran twice (round 13)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("fc_ms"))
      .cache()
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
      .join(firstClick, "user_id")
      .filter(col("p_ms") >= col("fc_ms") &&
        col("p_ms") <= col("fc_ms") + lit(FunnelWindowMs))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_conversions"))
    firstClick.join(conv, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("n_conversions"), lit(0L)).as("n_conversions"),
        (coalesce(col("n_conversions"), lit(0L)) > 0).as("converted"))
  }

  val funnelOracle: String = """
    WITH c AS (
      SELECT user_id, MIN(epoch_ms(ts)) AS fc_ms FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    p AS (
      SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM c JOIN events e ON e.user_id = c.user_id
        AND e.event_type = 'purchase'
        AND epoch_ms(e.ts) >= c.fc_ms
        AND epoch_ms(e.ts) <= c.fc_ms + 3600000
      GROUP BY c.user_id)
    SELECT c.user_id, COALESCE(p.n, 0) AS n_conversions,
      COALESCE(p.n, 0) > 0 AS converted
    FROM c LEFT JOIN p USING (user_id)"""

  /** k-step ORDERED funnel (k=3: click → view → purchase): per user
    * with at least one click, the earliest view within one hour AFTER
    * the first click, then every purchase within one hour after that
    * qualifying view. Each stage is the same scale shape as the
    * 2-step funnel — aggregate the previous stage's anchor per user
    * (hash shuffle on user_id), equi-join the next event type on
    * user_id, apply the stage window as a post-filter, re-aggregate —
    * so the whole k-chain is k equi-joins and never a θ-join
    * (PlanQualitySpec pins the plan exactly like it does for
    * [[funnel]]). Window arithmetic is millisecond-epoch on both
    * engines ([[FunnelWindowMs]]). */
  def funnelK(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
    // both stage frames cached (one row per user — bounded pins):
    // each feeds the next stage's join AND the final assembly join;
    // uncached, every reference re-ran its events scan + filter +
    // aggregate (round 13: 5 event scans → 3)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("fc_ms"))
      .cache()
    // earliest view inside the first stage window: min() over the
    // post-filtered equi-join — the "ordered" constraint is the filter
    val firstView = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("v_ms"))
      .join(firstClick, "user_id")
      .filter(col("v_ms") >= col("fc_ms") &&
        col("v_ms") <= col("fc_ms") + lit(FunnelWindowMs))
      .groupBy(col("user_id")).agg(min(col("v_ms")).as("fv_ms"))
      .cache()
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
      .join(firstView, "user_id")
      .filter(col("p_ms") >= col("fv_ms") &&
        col("p_ms") <= col("fv_ms") + lit(FunnelWindowMs))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_conversions"))
    firstClick
      .join(firstView, Seq("user_id"), "left")
      .join(conv, Seq("user_id"), "left")
      .select(col("user_id"),
        col("fv_ms").isNotNull.as("reached_view"),
        coalesce(col("n_conversions"), lit(0L)).as("n_conversions"),
        (coalesce(col("n_conversions"), lit(0L)) > 0).as("converted"))
  }

  val funnelKOracle: String = """
    WITH c AS (
      SELECT user_id, MIN(epoch_ms(ts)) AS fc_ms FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    v AS (
      SELECT c.user_id, MIN(epoch_ms(e.ts)) AS fv_ms
      FROM c JOIN events e ON e.user_id = c.user_id
        AND e.event_type = 'view'
        AND epoch_ms(e.ts) >= c.fc_ms
        AND epoch_ms(e.ts) <= c.fc_ms + 3600000
      GROUP BY c.user_id),
    p AS (
      SELECT v.user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM v JOIN events e ON e.user_id = v.user_id
        AND e.event_type = 'purchase'
        AND epoch_ms(e.ts) >= v.fv_ms
        AND epoch_ms(e.ts) <= v.fv_ms + 3600000
      GROUP BY v.user_id)
    SELECT c.user_id, v.user_id IS NOT NULL AS reached_view,
      COALESCE(p.n, 0) AS n_conversions,
      COALESCE(p.n, 0) > 0 AS converted
    FROM c LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)"""

  /** Hourly cohort retention: users grouped by the hour of their
    * first event; per cohort, how many came back exactly 1 hour and
    * exactly 24 hours later. Pure integer arithmetic (distinct
    * activity hours, 0/1 flags, counts) → exactly oracled. Scale
    * shape: two hash aggregations (first-event per user, distinct
    * (user, hour)) + one equi-join on user_id — no window over raw
    * events, no theta join. */
  def retention(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
    val firstH = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("cohort"))
    val acts = ev.select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .distinct()
    val flags = acts.join(firstH, "user_id")
      .groupBy(col("user_id"), col("cohort"))
      .agg(
        max(when(col("h") === col("cohort") + expr("INTERVAL 1 HOUR"), 1)
          .otherwise(0)).as("r1"),
        max(when(col("h") === col("cohort") + expr("INTERVAL 24 HOURS"), 1)
          .otherwise(0)).as("r24"))
    flags.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1")).as("n_retained_1h"),
        sum(col("r24")).as("n_retained_24h"))
      .select(unix_timestamp(col("cohort")).as("cohort_ts"),
        col("n_users"), col("n_retained_1h"), col("n_retained_24h"))
  }

  val retentionOracle: String = """
    WITH f AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS cohort
      FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
    fl AS (
      SELECT f.user_id, f.cohort,
        MAX(CASE WHEN a.h = f.cohort + INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS r1,
        MAX(CASE WHEN a.h = f.cohort + INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS r24
      FROM f JOIN a USING (user_id) GROUP BY f.user_id, f.cohort)
    SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_ts,
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(r1) AS BIGINT) AS n_retained_1h,
      CAST(SUM(r24) AS BIGINT) AS n_retained_24h
    FROM fl GROUP BY cohort"""

  /** Hourly volume-spike detection: hours where an event type's count
    * exceeds 2× its per-hour average. The threshold `c > 2·total/n`
    * is decided as the INTEGER cross-product `c·n > 2·total` — no
    * float division anywhere, so the cut is bit-portable and the op
    * stays exactly oracled (a double mean would reintroduce the
    * round-tie hazard the oracle rules ban). Two hash aggregations,
    * then a per-type join AQE broadcasts (types are low-cardinality). */
  def hourlySpikes(sp: SparkSession, dir: String): DataFrame = {
    val hourly = Engine.table(sp, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val totals = hourly.groupBy(col("event_type"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_hours"))
    hourly.join(totals, "event_type")
      .filter(col("c") * col("n_hours") > lit(2) * col("total"))
      .select(unix_timestamp(col("h")).as("hour_ts"), col("event_type"),
        col("c"), col("total"), col("n_hours"))
  }

  val hourlySpikesOracle: String = """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT event_type, SUM(c) AS total, COUNT(*) AS n_hours
      FROM hourly GROUP BY event_type)
    SELECT CAST(epoch(h) AS BIGINT) AS hour_ts, hourly.event_type,
      CAST(c AS BIGINT) AS c, CAST(total AS BIGINT) AS total,
      CAST(n_hours AS BIGINT) AS n_hours
    FROM hourly JOIN totals USING (event_type)
    WHERE c * n_hours > 2 * total"""

  /** Per-user activity profile — the feature-engineering aggregation
    * behind user-level sampling/weighting decisions: event counts by
    * type, distinct active hours, first/last active hour. One hash
    * aggregation keyed on user_id; timestamps surface as the proven
    * hour-epoch integers (second-precision epochs diverge between
    * engines on nanos timestamps). */
  def userStats(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        countDistinct(date_trunc("hour", col("ts"))).as("n_active_hours"),
        unix_timestamp(date_trunc("hour", min(col("ts")))).as("first_hour_ts"),
        unix_timestamp(date_trunc("hour", max(col("ts")))).as("last_hour_ts"))

  val userStatsOracle: String = """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        AS n_purchases,
      CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        AS n_clicks,
      CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_active_hours,
      CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS first_hour_ts,
      CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS last_hour_ts
    FROM events GROUP BY user_id"""

  /** Event-type transition matrix: for each per-user consecutive
    * event pair, count (prev_type → type) and the row-conditional
    * probability — the Markov-chain view of user behavior (what
    * follows a click?). Ordering is (ms-epoch, event_id): the ms
    * truncation is the shared engine precision and event_id breaks
    * ms ties deterministically on both sides. Scale shape: one hash
    * exchange on user_id for the lag window (partition-local after
    * that), then an aggregation whose result is at most |types|²
    * rows — the window over THAT for row totals is driver-trivial.
    * p is an exact-int ÷ exact-int double division — bit-portable
    * (IEEE correctly-rounded on both engines). */
  def transitions(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
  }

  val transitionsOracle: String = """
    WITH seq AS (
      SELECT user_id, event_type,
        lag(event_type) OVER (PARTITION BY user_id
          ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM events),
    m AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, event_type, n,
      CAST(n AS DOUBLE) /
        CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM m"""

  /** Trailing 1-hour moving average of `value` per user — the sliding
    * feature-engineering staple (per-entity rolling rate/mean feeding
    * a model or an anomaly rule). One row per event: how many events
    * and what mean value this user produced in the hour up to and
    * including it.
    *
    * A RANGE frame over the ms epoch, not ROWS: simultaneous events
    * are frame-peers on both engines, so ties cannot reorder results.
    * The frame sum uses [[Exact.dsumOver]] (exact scaled-integer /
    * decimal accumulation) and the mean is one exact-sum ÷ exact-count
    * double division — bit-portable (IEEE correctly-rounded on both
    * engines). Both engines evaluate the frame at the shared ms
    * precision (unix_millis / epoch_ms).
    *
    * Scale shape: one hash exchange on user_id, then the window runs
    * partition-local; frame width is bounded by one user's events per
    * hour, so no per-row state explosion. */
  def movingAvg(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    ev.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", Exact.dsumOver(col("value"), w))
      .withColumn("avg_win", col("sum_win") / col("n_win"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("n_win"), col("sum_win"), col("avg_win"))
  }

  val movingAvgOracle: String = """
    SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
      COUNT(*) OVER w AS n_win,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_win,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        / COUNT(*) OVER w AS avg_win
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_ms(ts) AS BIGINT)
      RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)"""

  /** Recency window for [[attribution]] (30 min, ms). */
  val AttributionWindowMs = 1800000L

  /** Last-touch attribution: each purchase credited to the most recent
    * click/view by the same user at-or-before it within
    * [[AttributionWindowMs]], else "none". Same scale shape as
    * [[asofJoin]]: union the touch and purchase streams, ONE hash
    * exchange on user_id, a running last() over the per-user timeline
    * — the at-or-before predicate never becomes a join condition (no
    * θ-join at any scale). The recency cut is applied AFTER picking
    * the latest touch, which is equivalent (any other touch is older
    * still) and keeps the frame a plain unbounded→current run. Ties
    * break on (tag, event_id): touches sort before purchases at the
    * same millisecond — at-or-before is inclusive — and the highest
    * event_id wins among same-ms touches, mirrored by the oracle's
    * ORDER BY t_ms DESC, event_id DESC. All time comparisons at the
    * shared ms precision (see [[FunnelWindowMs]]). */
  def attribution(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        lit(0).as("tag"), col("event_id"),
        col("event_id").as("t_id"), col("event_type").as("t_type"),
        unix_millis(col("ts")).as("t_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        lit(1).as("tag"), col("event_id"),
        lit(null).cast("long").as("t_id"),
        lit(null).cast("string").as("t_type"),
        lit(null).cast("long").as("t_ms"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inWindow = col("lt_ms") >= col("ts_ms") - lit(AttributionWindowMs)
    touches.unionByName(purchases)
      .withColumn("lt_id", last(col("t_id"), ignoreNulls = true).over(w))
      .withColumn("lt_type", last(col("t_type"), ignoreNulls = true).over(w))
      .withColumn("lt_ms", last(col("t_ms"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        when(inWindow, col("lt_type")).otherwise(lit("none")).as("touch_type"),
        when(inWindow, col("lt_id")).as("touch_id"))
  }

  val attributionOracle: String = """
    WITH t AS (
      SELECT user_id, event_id, event_type,
        CAST(epoch_ms(ts) AS BIGINT) AS t_ms
      FROM events WHERE event_type IN ('click', 'view')),
    p AS (
      SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS p_ms
      FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT p.event_id AS purchase_id, t.event_id AS touch_id,
        t.event_type AS touch_type,
        ROW_NUMBER() OVER (PARTITION BY p.event_id
          ORDER BY t.t_ms DESC, t.event_id DESC) AS rn
      FROM p JOIN t ON t.user_id = p.user_id
        AND t.t_ms <= p.p_ms AND t.t_ms >= p.p_ms - 1800000)
    SELECT p.event_id AS purchase_id, p.user_id,
      COALESCE(j.touch_type, 'none') AS touch_type, j.touch_id
    FROM p LEFT JOIN j ON j.purchase_id = p.event_id AND j.rn = 1"""

  /** Semi-structured property extraction: parse the JSON `props`
    * column with a TYPED schema (`from_json`, one parse per row, no
    * per-key re-parse like repeated `get_json_object` calls would do)
    * and profile the extracted field per event type. The pattern every
    * event pipeline needs first: JSON stays opaque in storage, the
    * parse happens row-local at scan time, and only the typed field
    * reaches the aggregate — the shuffle carries six numbers per
    * (event_type × partition), never the JSON text. Malformed or
    * missing keys become NULL (from_json PERMISSIVE mode), counted
    * separately from present values — both engines agree because
    * DuckDB's json_extract also yields NULL there. Integer-only
    * outputs → hash-exact. */
  def jsonExtract(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "events")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))

  val jsonExtractOracle: String = """
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(k) AS BIGINT) AS n_with_k,
      MIN(k) AS min_k, MAX(k) AS max_k,
      CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (SELECT event_type,
            -- json_valid guard: Spark's PERMISSIVE from_json yields
            -- NULL on malformed JSON; DuckDB's json_extract would
            -- ERROR — evaluate the same NULL on both engines so a
            -- regenerated corpus with a bad row can't desync the tie
            CASE WHEN json_valid(props)
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
          FROM events)
    GROUP BY event_type"""

  /** CDC log compaction: the LATEST event per user — the canonical
    * "materialize current state from a change stream" operator (every
    * CDC/upsert pipeline's read path). Implemented as a rank-limited
    * window so Spark plans WindowGroupLimit: each input partition
    * keeps only its own per-user latest BEFORE the exchange, so the
    * shuffle carries ≤ (partitions × users-per-partition) rows, not
    * the full log — the property that matters when the log is 100 TB
    * and the state is millions of keys.
    *
    * Bit-portability: recency order is (ms epoch DESC, event_id DESC)
    * — integer and total on both engines (raw timestamps would order
    * at ns precision in DuckDB but µs in Spark); `value` is an
    * untouched double passthrough. */
  def cdcCompact(sp: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    Engine.table(sp, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts_ms").as("last_ts_ms"),
        col("event_type").as("last_type"), col("value").as("last_value"))
  }

  val cdcCompactOracle: String = """
    SELECT user_id, event_id AS last_event_id, ts_ms AS last_ts_ms,
      event_type AS last_type, value AS last_value
    FROM (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rk
      FROM events)
    WHERE rk = 1"""

  /** Type-2 slowly-changing-dimension builder: compress each user's
    * event log into validity intervals of their event_type attribute
    * — one row per CHANGE, `[valid_from, valid_to)`, open-ended for
    * the current value. The write path of every SCD2/temporal table
    * (the read path is [[cdcCompact]]).
    *
    * Scale shape: ONE exchange on user_id; the change-point filter
    * and the valid_to lead run inside the same partitioning (the
    * filter preserves sort order, so the second window needs no new
    * exchange or sort). Output is bounded by the number of CHANGES,
    * not events — the compression a temporal table exists for.
    *
    * Bit-portability: (ms epoch, event_id) ordering, integer
    * everywhere; `is_current` is the NULL-ness of valid_to. */
  def scd2(sp: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    Engine.table(sp, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        col("ts_ms").as("valid_from_ms"), col("valid_to_ms"),
        col("valid_to_ms").isNull.as("is_current"))
  }

  val scd2Oracle: String = """
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
      FROM events),
    ch AS (
      SELECT user_id, event_id, event_type, ts_ms,
        lag(event_type) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id) AS prev_type
      FROM e),
    cp AS (
      SELECT user_id, event_id, event_type, ts_ms FROM ch
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type, ts_ms AS valid_from_ms,
      lead(ts_ms) OVER w AS valid_to_ms,
      (lead(ts_ms) OVER w IS NULL) AS is_current
    FROM cp
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)"""

  /** Multiplier on the MAD that marks an hour anomalous. */
  val MadK = 3L

  /** Robust anomaly detection on hourly event volumes: per event
    * type, flag hours whose count deviates from the per-type MEDIAN
    * by more than [[MadK]]× the median absolute deviation — the
    * outlier-resistant sibling of [[hourlySpikes]]' mean-ratio test
    * (one anomalous day shifts a mean but not a median).
    *
    * Exactness: both medians are LOWER medians computed from the
    * (type, value)-count distribution with the cumulative-count
    * trick (same as StatsOps.lengthQuantiles) — integer-exact, no
    * interpolated .5 values, no float comparison anywhere; the flag
    * compares integer cross-products (dev > MadK·mad).
    *
    * Scale shape: after the first aggregation everything operates on
    * the (type × hour) aggregate — 8 760 rows/type/year regardless
    * of corpus size; the windows run over per-type value
    * DISTRIBUTIONS, smaller still. */
  def anomalyMad(sp: SparkSession, dir: String): DataFrame = {
    def lowerMedian(values: DataFrame, valueCol: String, out: String): DataFrame = {
      val wCum = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
      val wAll = Window.partitionBy(col("event_type"))
      values.groupBy(col("event_type"), col(valueCol))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("tot", sum(col("c")).over(wAll))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= ceil(col("tot") * lit(0.5)),
          col(valueCol))).as(out))
    }
    // hourly and withDev are (type × hour)-bounded aggregates that
    // feed 2-3 consumers each — uncached, every consumer re-scanned
    // and re-aggregated the events table (round 13; 3-4 scans → 1)
    val hourly = Engine.table(sp, dir, "events")
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
      .cache()
    val med = lowerMedian(hourly, "n", "med")
    val withDev = hourly.join(med, "event_type")
      .withColumn("dev", abs(col("n") - col("med")))
      .cache()
    val mad = lowerMedian(withDev, "dev", "mad")
    withDev.join(mad, "event_type")
      .select(col("event_type"), col("hour_ts"), col("n"), col("med"),
        col("mad"), (col("dev") > lit(MadK) * col("mad")).as("is_anomaly"))
  }

  val anomalyMadOracle: String = s"""
    WITH hourly AS (
      SELECT event_type,
        CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    medd AS (
      SELECT event_type, MIN(CASE WHEN cum >= CEIL(tot*0.5) THEN n END) AS med
      FROM (
        SELECT event_type, n, SUM(c) OVER (PARTITION BY event_type ORDER BY n) AS cum,
          SUM(c) OVER (PARTITION BY event_type) AS tot
        FROM (SELECT event_type, n, COUNT(*) AS c FROM hourly
              GROUP BY event_type, n))
      GROUP BY event_type),
    dev AS (
      SELECT h.event_type, h.hour_ts, h.n, m.med, ABS(h.n - m.med) AS dev
      FROM hourly h JOIN medd m USING (event_type)),
    madd AS (
      SELECT event_type, MIN(CASE WHEN cum >= CEIL(tot*0.5) THEN dev END) AS mad
      FROM (
        SELECT event_type, dev, SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
          SUM(c) OVER (PARTITION BY event_type) AS tot
        FROM (SELECT event_type, dev, COUNT(*) AS c FROM dev
              GROUP BY event_type, dev))
      GROUP BY event_type)
    SELECT d.event_type, d.hour_ts, d.n, d.med, a.mad,
      (d.dev > $MadK * a.mad) AS is_anomaly
    FROM dev d JOIN madd a USING (event_type)"""

  /** Inter-arrival-time distribution per event type: exact p50/p90/p99
    * of the gap between a user's consecutive events of the same type —
    * the cadence audit behind bot detection (impossibly regular gaps)
    * and session-gap calibration (where the 30-minute sessionize cut
    * actually sits in the data). Scale shape: the lag window partitions
    * by (user_id, event_type) — millions of small partitions, never a
    * per-type global ordering — and the quantiles come from the
    * (type, delta)-count DISTRIBUTION with a cumulative window over
    * distinct gaps (the [[graft.operators.StatsOps.lengthQuantiles]]
    * discipline), so no raw-delta sort ever runs. All integer (ms
    * gaps, rank arithmetic via ceil on identical doubles) →
    * hash-exact. */
  def interArrival(sp: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ms"), col("event_id"))
    val deltas = Engine.table(sp, dir, "events")
      .select(col("event_type"), col("user_id"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("ms") - col("prev")).as("delta"))
    val counts = deltas.groupBy(col("event_type"), col("delta"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("delta"))
    val wAll = Window.partitionBy(col("event_type"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(
        wCum.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("c")).over(wAll))
    val qs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)).map {
      case (name, p) =>
        min(when(col("cum") >= ceil(lit(p) * col("tot")), col("delta")))
          .as(name)
    }
    val aggs = max(col("tot")).as("n_gaps") +: max(col("delta")).as("max_gap") +: qs
    cum.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
  }

  val interArrivalOracle: String = """
    WITH d AS (
      SELECT event_type,
        epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
          PARTITION BY user_id, event_type
          ORDER BY epoch_ms(ts), event_id) AS delta
      FROM events),
    counts AS (
      SELECT event_type, delta, CAST(COUNT(*) AS BIGINT) AS c
      FROM d WHERE delta IS NOT NULL GROUP BY event_type, delta),
    cum AS (
      SELECT event_type, delta,
        SUM(c) OVER (PARTITION BY event_type ORDER BY delta
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS tot
      FROM counts)
    SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_gaps,
      MAX(delta) AS max_gap,
      MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN delta END) AS p50,
      MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN delta END) AS p90,
      MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN delta END) AS p99
    FROM cum GROUP BY event_type"""

  /** Cadence-regularity bot scoring: a human's inter-event gaps are
    * bursty (coefficient of variation ≈ 1 for Poisson-ish arrivals,
    * usually higher); scripted traffic ticks — many events at
    * near-constant gaps, CV² ≪ 1. Per user: second-granularity gaps
    * capped at one hour (sub-hour cadence is the bot signature;
    * overnight pauses would drown the statistic), exact integer
    * first/second moments, CV² = (n·Σg² − (Σg)²)/(Σg)² evaluated on
    * the [[graft.operators.StatsOps.valueCorr]] float discipline
    * (sums cast to double AFTER exact integer aggregation, identical
    * expression order on both engines, zero-mean guard), and the
    * flag `is_bot` = (n ≥ 20 ∧ CV² < 0.1) written as the same CASE
    * on both sides. One lag window per (user) + one aggregate —
    * fully oracled. */
  def botScore(sp: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val gaps = Engine.table(sp, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        least(expr("(ms - prev) div 1000"), lit(3600L)).as("g"))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g")).cast("double").as("sg"),
        sum(col("g") * col("g")).cast("double").as("sgg"))
      .select(col("user_id"), col("n_gaps"),
        when(col("sg") > 0,
          (col("n_gaps") * col("sgg") - col("sg") * col("sg")) /
            (col("sg") * col("sg"))).as("cv2"),
        (col("n_gaps") >= 20 &&
          when(col("sg") > 0,
            (col("n_gaps") * col("sgg") - col("sg") * col("sg")) /
              (col("sg") * col("sg"))).otherwise(lit(Double.MaxValue)) < 0.1)
          .as("is_bot"))
  }

  val botScoreOracle: String = """
    WITH d AS (
      SELECT user_id,
        epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
          PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS dms
      FROM events),
    -- the null first-event lag is dropped BEFORE the cap: DuckDB's
    -- LEAST ignores NULL arguments, so capping first would turn every
    -- user's first event into a spurious 3600 s gap
    g AS (
      SELECT user_id, LEAST(dms // 1000, 3600) AS g
      FROM d WHERE dms IS NOT NULL),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        CAST(CAST(SUM(g) AS BIGINT) AS DOUBLE) AS sg,
        CAST(CAST(SUM(g * g) AS BIGINT) AS DOUBLE) AS sgg
      FROM g GROUP BY user_id)
    SELECT user_id, n_gaps,
      CASE WHEN sg > 0
        THEN (n_gaps * sgg - sg * sg) / (sg * sg) END AS cv2,
      (n_gaps >= 20 AND
        CASE WHEN sg > 0 THEN (n_gaps * sgg - sg * sg) / (sg * sg)
             ELSE 1e308 END < 0.1) AS is_bot
    FROM s"""

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands shape (engagement/retention feature for user
    * cohorting): distinct active DAYS per user, then `day − row_number`
    * is constant within a maximal run of consecutive days, so grouping
    * on that constant yields streaks. Scale shape: the distinct
    * (user, day) aggregate shrinks raw events to ≤ users × days rows
    * BEFORE any window runs; the row_number window then orders each
    * user's distinct days (bounded by the calendar span, never by
    * event volume). Day = epoch-ms div 86 400 000 — pure integer on
    * both engines (events are post-1970, so floor vs trunc division
    * agree). All-integer output → hash-exact oracle. */
  def userStreaks(sp: SparkSession, dir: String): DataFrame = {
    val days = Engine.table(sp, dir, "events")
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  val userStreaksOracle: String = """
    WITH d AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
    g AS (
      SELECT user_id, day,
        day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d),
    s AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM g GROUP BY user_id, grp)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
      MAX(len) AS longest_streak, CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM s GROUP BY user_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_interarrival" -> (interArrival _),
    "events_bot_score" -> (botScore _),
    "events_user_streaks" -> (userStreaks _),
    "events_scd2" -> (scd2 _),
    "events_anomaly_mad" -> (anomalyMad _),
    "events_cdc_compact" -> (cdcCompact _),
    "events_json_extract" -> (jsonExtract _),
    "events_hourly_users" -> (hourlyUsers _),
    "events_attribution" -> (attribution _),
    "events_moving_avg" -> (movingAvg _),
    "events_window_agg" -> (windowAgg _),
    "events_funnel" -> (funnel _),
    "events_funnel_k" -> (funnelK _),
    "events_retention" -> (retention _),
    "events_hourly_spikes" -> (hourlySpikes _),
    "events_user_stats" -> (userStats _),
    "events_transitions" -> (transitions _),
    "events_window_hopping" -> (windowHopping _),
    "events_sessionize" -> (sessionize _),
    "events_asof_join" -> (asofJoin _),
    "events_asof_nearest" -> (asofNearest _),
    "events_range_join" -> (rangeJoin _))

  val oracles: Map[String, String] = Map(
    "events_interarrival" -> interArrivalOracle,
    "events_bot_score" -> botScoreOracle,
    "events_user_streaks" -> userStreaksOracle,
    "events_scd2" -> scd2Oracle,
    "events_anomaly_mad" -> anomalyMadOracle,
    "events_cdc_compact" -> cdcCompactOracle,
    "events_json_extract" -> jsonExtractOracle,
    "events_hourly_users" -> hourlyUsersOracle,
    "events_attribution" -> attributionOracle,
    "events_moving_avg" -> movingAvgOracle,
    "events_window_agg" -> windowAggOracle,
    "events_funnel" -> funnelOracle,
    "events_funnel_k" -> funnelKOracle,
    "events_retention" -> retentionOracle,
    "events_hourly_spikes" -> hourlySpikesOracle,
    "events_user_stats" -> userStatsOracle,
    "events_transitions" -> transitionsOracle,
    "events_window_hopping" -> windowHoppingOracle,
    "events_sessionize" -> sessionizeOracle,
    "events_asof_join" -> asofJoinOracle,
    "events_asof_nearest" -> asofNearestOracle,
    "events_range_join" -> rangeJoinOracle)
}
