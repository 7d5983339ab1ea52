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
    * Scale shape: ONE exchange. `collect_set` on `l_orderkey` dedups
    * parts within an order and assembles the basket in the same
    * aggregate (per-basket state is bounded by order width — a few
    * dozen parts — and baskets over [[BasketCap]] are dropped right
    * after), so the raw table is shuffled exactly once. The pair
    * expansion is a codegen'd array comprehension over the sorted
    * basket — quadratic only within a capped basket, never a join —
    * and p1 < p2 falls out of the sort order. The pair aggregation
    * partially combines map-side; the final top-k is a TakeOrdered
    * over the (tiny) aggregated pair table, never a global sort of
    * raw pairs. (The round-10 form self-joined a deduped item table
    * on the order key: same output, but two extra exchanges and a
    * 226k-row join probe at sf0.1.) */
  def basketPairs(sp: SparkSession, dir: String): DataFrame = {
    Engine.table(sp, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")).between(2, BasketCap))
      // pair expansion as two chained Generates (round 13): the old
      // single explode over flatten(transform(transform(...))) ran the
      // nested higher-order functions INTERPRETED (HOFs are
      // CodegenFallback), materializing a pair-array of structs per
      // basket; two explodes + a clamped slice stay entirely inside
      // WholeStageCodegen. Emitted pair multiset is identical (every
      // (earlier, later) element pair of the sorted basket, once).
      .select(posexplode(col("ps")).as(Seq("i", "p1")), col("ps"))
      .select(col("p1"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("p2"))
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

  /** Minimum bigram count for a collocation candidate (sized to the
    * synthetic corpus: max bigram count at sf0.01 is ~48; a real
    * corpus would set this orders of magnitude higher). */
  val CollocMinSupport = 15L

  /** Collocations reported. */
  val CollocTopK = 30

  /** Collocation mining: word bigrams that co-occur far more than
    * their unigram frequencies predict, ranked by LIFT — the log-free
    * integer form of PMI: lift_ppm = (n_tokens · c_ab · 10^6) div
    * (c_a · c_b) (PMI = log of the same ratio, so the RANKING is
    * identical and the arithmetic stays exact → fully oracled).
    *
    * Scale shape: bigram extraction is one window pass partitioned by
    * doc_id (pre-partitioned by the scan, no pathological keys);
    * unigram and bigram counts partially aggregate map-side; the two
    * unigram joins run AFTER the min-support filter, so only
    * candidate bigrams join, and the top-k is a TakeOrdered over the
    * candidate aggregate. Overflow headroom: n_tokens·c_ab·10^6 must
    * stay under 2^63 — at corpus sizes where it wouldn't (n_tokens ≳
    * 10^9 with hot pairs), drop the 10^6 scale first; the ranking is
    * what matters. */
  def collocations(sp: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = Engine.table(sp, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val bigrams = toks
      .withColumn("next", lead(col("token"), 1).over(w))
      .filter(col("next").isNotNull)
    val cAb = bigrams.groupBy(col("token"), col("next"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CollocMinSupport)
    // cached: vocabulary-sized (one row per distinct token — a bounded
    // pin, not a corpus stream), referenced three times below (both
    // unigram join sides + the total). n_tokens = Σ c_a exactly —
    // summing the pinned unigram aggregate replaces what was a THIRD
    // scan+explode of the corpus (round 13)
    val cA = toks.groupBy(col("token")).agg(count(lit(1)).as("c_a")).cache()
    val n = cA.agg(sum(col("c_a")).as("n_tokens"))
    cAb
      .join(cA, Seq("token"))
      .join(cA.select(col("token").as("next"), col("c_a").as("c_b")),
        Seq("next"))
      .crossJoin(broadcast(n))
      .select(
        concat(col("token"), lit(" "), col("next")).as("bigram"),
        col("c_ab"), col("c_a"), col("c_b"),
        expr("(n_tokens * c_ab * 1000000L) div (c_a * c_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("bigram").asc)
      .limit(CollocTopK)
  }

  val collocationsOracle: String = s"""
    WITH toks AS (
      SELECT doc_id,
        unnest(string_split(text, ' ')) AS token,
        unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM documents),
    bigrams AS (
      SELECT token, lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
        AS next
      FROM toks),
    c_ab AS (
      SELECT token, next, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM bigrams WHERE next IS NOT NULL
      GROUP BY token, next
      HAVING COUNT(*) >= $CollocMinSupport),
    c_a AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS c_a
      FROM toks GROUP BY token),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks)
    SELECT x.token || ' ' || x.next AS bigram, x.c_ab, a.c_a, b.c_a AS c_b,
      (n.n_tokens * x.c_ab * 1000000) // (a.c_a * b.c_a) AS lift_ppm
    FROM c_ab x
      JOIN c_a a ON x.token = a.token
      JOIN c_a b ON x.next = b.token
      CROSS JOIN n
    ORDER BY lift_ppm DESC, bigram ASC
    LIMIT $CollocTopK"""

  /** Quintile thresholds for [[rfm]] (p20/p40/p60/p80, lower
    * quantiles via the cumulative-count trick — integer-exact). The
    * cumulative count is DISTRIBUTED ([[ScaleWindows.cumulative]]):
    * r_ms is millisecond-granular and m_cents an exact cent sum, so
    * their (value, count) distributions scale with |users| — a
    * single-partition window here would be the r10 WindowExec warning
    * at 100 TB, not a bounded aggregate. */
  /** ONE distribution pass for all three quintile threshold sets
    * (round 14; the r13 shape ran three sequential
    * groupBy → range-partition → offsets-fetch → window passes, one
    * per metric — each a full users-frame aggregation plus a driver
    * collect). The users frame is unpivoted to (metric, v) rows,
    * aggregated to the three (value, count) distributions in one
    * exchange, cumulated per metric by [[ScaleWindows.cumulativeBy]]
    * (one range partition + ONE offsets fetch), and reduced to the
    * same 12 threshold columns. Threshold arithmetic is unchanged:
    * t_i = min value whose cumulative count reaches ceil(tot·p) —
    * integer-exact, so the oracle hash cannot move. */
  private def quintilesAll(users: DataFrame): DataFrame = {
    val dist = users.select(explode(array(
        struct(lit("r").as("m"), col("r_ms").as("v")),
        struct(lit("f").as("m"), col("f").as("v")),
        struct(lit("m").as("m"), col("m_cents").as("v")))).as("x"))
      .select(col("x.m").as("metric"), col("x.v").as("v"))
      .groupBy(col("metric"), col("v")).agg(count(lit(1)).as("c"))
    val cum = ScaleWindows.cumulativeBy(dist, "metric", "v", "c")
    val perMetric = Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.map { case (p, i) =>
      min(when(col("cum") >= ceil(col("tot") * lit(p)), col("v")))
        .as(s"t${i + 1}")
    }
    val th = cum.groupBy(col("metric"))
      .agg(perMetric.head, perMetric.tail: _*)
    // pivot the 3 threshold rows to the one 12-column row the scoring
    // crossJoin broadcasts — a 3-row aggregate, still plan-side
    val cols = for {
      pfx <- Seq("r", "f", "m"); i <- 1 to 4
    } yield min(when(col("metric") === pfx, col(s"t$i")))
      .as(s"${pfx}_t$i")
    th.agg(cols.head, cols.tail: _*)
  }

  /** RFM customer scoring: per user, Recency (latest activity),
    * Frequency (event count) and Monetary (exact cent sum), each
    * bucketed 1-5 against the population's quintile thresholds —
    * the classic segmentation (5-5-5 = best customers).
    *
    * Exactness: monetary sums cents (`rint(value·100)` — the values
    * are 2-decimal, so no half-way rounding exists and Spark's rint
    * matches DuckDB's round), thresholds are lower quantiles from
    * the integer (value, count) distributions, and a score is
    * `1 + #thresholds strictly below` — tie-stable, fully oracled.
    *
    * Scale shape: one aggregation to the per-user table; ONE
    * unpivoted distribution pass computes all three (value, count)
    * DISTRIBUTIONS and their per-metric DISTRIBUTED cumulative sums
    * (r_ms/m_cents distributions scale with |users| — see
    * [[quintilesAll]]); scoring is a broadcast of one 12-number
    * row. */
  def rfm(sp: SparkSession, dir: String): DataFrame = {
    // cached: the three quintile passes each run a driver-side
    // cumulative-offset fetch over this frame and the final scoring
    // pass reads it again — uncached, that is FOUR full scans +
    // aggregations of the events table (round-13 measured: the op's
    // dominant cost). The pin is |users| narrow rows, the op's own
    // working set, dropped by the harness cache clear.
    val users = Engine.table(sp, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_millis(col("ts"))).as("r_ms"),
        count(lit(1)).as("f"),
        sum(rint(col("value") * 100).cast("long")).as("m_cents"))
      .cache()
    val th = quintilesAll(users)
    def score(v: String, prefix: String) =
      (lit(1) +
        when(col(v) > col(s"${prefix}_t1"), 1).otherwise(0) +
        when(col(v) > col(s"${prefix}_t2"), 1).otherwise(0) +
        when(col(v) > col(s"${prefix}_t3"), 1).otherwise(0) +
        when(col(v) > col(s"${prefix}_t4"), 1).otherwise(0)).cast("int")
    users.crossJoin(broadcast(th))
      .select(col("user_id"), col("r_ms"), col("f"), col("m_cents"),
        score("r_ms", "r").as("r_score"),
        score("f", "f").as("f_score"),
        score("m_cents", "m").as("m_score"))
  }

  val rfmOracle: String = {
    def q(src: String, v: String, prefix: String): String = {
      val qs = Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.map { case (p, i) =>
        s"MIN(CASE WHEN cum >= CEIL(tot*$p) THEN $v END) AS ${prefix}_t${i + 1}"
      }.mkString(", ")
      s"""(SELECT $qs FROM (
        SELECT $v, SUM(c) OVER (ORDER BY $v) AS cum,
          SUM(c) OVER () AS tot
        FROM (SELECT $v, COUNT(*) AS c FROM $src GROUP BY $v)))"""
    }
    def sc(v: String, prefix: String): String =
      s"CAST(1 + (CASE WHEN $v > ${prefix}_t1 THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN $v > ${prefix}_t2 THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN $v > ${prefix}_t3 THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN $v > ${prefix}_t4 THEN 1 ELSE 0 END) AS INT)"
    s"""
    WITH users AS (
      SELECT user_id, MAX(epoch_ms(ts)) AS r_ms,
        CAST(COUNT(*) AS BIGINT) AS f,
        CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS m_cents
      FROM events GROUP BY user_id),
    th AS (SELECT * FROM ${q("users", "r_ms", "r")},
      ${q("users", "f", "f")}, ${q("users", "m_cents", "m")})
    SELECT user_id, r_ms, f, m_cents,
      ${sc("r_ms", "r")} AS r_score,
      ${sc("f", "f")} AS f_score,
      ${sc("m_cents", "m")} AS m_score
    FROM users CROSS JOIN th"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_basket_pairs" -> (basketPairs _),
    "events_session_paths" -> (sessionPaths _),
    "text_collocations" -> (collocations _),
    "events_rfm" -> (rfm _))

  val oracles: Map[String, String] = Map(
    "orders_basket_pairs" -> basketPairsOracle,
    "events_session_paths" -> sessionPathsOracle,
    "text_collocations" -> collocationsOracle,
    "events_rfm" -> rfmOracle)
}
