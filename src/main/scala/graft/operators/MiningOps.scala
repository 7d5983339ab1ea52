package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pattern-mining operators: market-basket co-occurrence over orders
  * and sequential path mining over event sessions. Part of the
  * training-data-pipeline / analytics surface (no reference
  * counterpart — the reference dialect has no self-join-free way to
  * express either, SURVEY §0).
  *
  * Both are exact integer counting → fully oracled.
  */
object MiningOps {

  /** Orders with more baskets items than this are excluded from pair
    * counting — the standard guard that keeps the per-basket pair
    * expansion (quadratic in basket size) bounded at scale: one
    * pathological 10^5-item basket would otherwise emit 10^10 pairs.
    * The cap is mirrored verbatim in the oracle. */
  val BasketCap = 15L

  /** Top pair count reported. */
  val PairTopK = 100

  /** Market-basket analysis: which part pairs co-occur in the same
    * order, counted across all orders, top-[[PairTopK]] by support.
    *
    * Scale shape: the basket table is deduped (order, part) pairs; the
    * self-join is an equi-join on `l_orderkey` — both sides hash into
    * the SAME partitioning, so Spark plans one exchange feeding a
    * co-partitioned join, and the quadratic blow-up is bounded per
    * basket by [[BasketCap]]. The pair aggregation partially combines
    * map-side; the final top-k is a TakeOrdered over the (tiny)
    * aggregated pair table, never a global sort of raw pairs. */
  def basketPairs(sp: SparkSession, dir: String): DataFrame = {
    val items = Engine.table(sp, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val small = items.groupBy(col("ok"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= BasketCap)
      .select("ok")
    val kept = items.join(small, "ok")
    val a = kept.select(col("ok"), col("pk").as("p1"))
    val b = kept.select(col("ok"), col("pk").as("p2"))
    a.join(b, "ok")
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc)
      .limit(PairTopK)
  }

  val basketPairsOracle: String = s"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    small AS (
      SELECT ok FROM items GROUP BY ok HAVING COUNT(*) <= $BasketCap),
    kept AS (SELECT i.ok, i.pk FROM items i JOIN small USING (ok))
    SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS n_orders
    FROM kept a JOIN kept b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY a.pk, b.pk
    ORDER BY n_orders DESC, p1 ASC, p2 ASC
    LIMIT $PairTopK"""

  /** Session gap shared with [[EventOps.sessionize]]. */
  private val GapMs = 1800000L

  /** How many top paths to report. */
  val PathTopK = 20

  /** Sequential path mining: the most common 3-step event-type paths
    * (a>b>c over consecutive events) inside 30-minute user sessions.
    *
    * Scale shape: ONE exchange on `user_id`; session numbering, the
    * two leads and the session-boundary guard all run inside that
    * partitioning (consecutive window specs share the sort). The
    * path aggregation reduces to ≤ |types|³ rows — partial map-side
    * combine makes the final exchange trivially small, and the top-k
    * is a TakeOrdered over that tiny aggregate.
    *
    * Bit-portability: window order is (ms epoch, event_id) — total
    * and integer on both engines (the raw timestamp would order at
    * ns precision in DuckDB but µs in Spark). */
  def sessionPaths(sp: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    Engine.table(sp, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("new_session",
        when(lag(col("ts_ms"), 1).over(byUser).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > GapMs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t2", lead(col("event_type"), 1).over(bySession))
      .withColumn("t3", lead(col("event_type"), 2).over(bySession))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat(col("event_type"), lit(">"), col("t2"),
        lit(">"), col("t3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(PathTopK)
  }

  val sessionPathsOracle: String = s"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
      FROM events),
    flagged AS (
      SELECT user_id, event_id, event_type, ts_ms,
        CASE WHEN lag(ts_ms) OVER w IS NULL
          OR ts_ms - lag(ts_ms) OVER w > $GapMs THEN 1 ELSE 0 END
          AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
    numbered AS (
      SELECT user_id, event_id, event_type, ts_ms,
        SUM(new_session) OVER (PARTITION BY user_id
          ORDER BY ts_ms, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_seq
      FROM flagged),
    paths AS (
      SELECT event_type || '>' || lead(event_type, 1) OVER s
          || '>' || lead(event_type, 2) OVER s AS path,
        lead(event_type, 2) OVER s AS t3
      FROM numbered
      WINDOW s AS (PARTITION BY user_id, session_seq
        ORDER BY ts_ms, event_id))
    SELECT path, COUNT(*) AS n FROM paths
    WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path ASC
    LIMIT $PathTopK"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_basket_pairs" -> (basketPairs _),
    "events_session_paths" -> (sessionPaths _))

  val oracles: Map[String, String] = Map(
    "orders_basket_pairs" -> basketPairsOracle,
    "events_session_paths" -> sessionPathsOracle)
}
