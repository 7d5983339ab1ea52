package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed corpus statistics — the profiling pass every curation
  * pipeline runs before filtering thresholds are chosen.
  *
  * Two families:
  *  - EXACT per-group quantiles, shaped for scale: aggregate to
  *    (group, value) counts first — one partial-agg shuffle over data
  *    whose size is groups × distinct values, NOT rows — then take
  *    discrete (type-1) quantiles from the cumulative distribution
  *    with a window over that tiny aggregate. Integer in, integer
  *    out → hash-exact against the DuckDB oracle.
  *  - SKETCHES (HLL distinct counts, compressed-histogram quantiles):
  *    the 100 TB path when even the distinct-value aggregate is big
  *    or a single pass must answer many columns. Approximate by
  *    construction → no SQL oracle; each is quality-gated against its
  *    exact twin in quality.json / StatsSpec.
  */
object StatsOps {

  private val Ps = Seq(("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p90", 0.90))

  /** Exact discrete quantiles of document length per language: the
    * value at rank ceil(p·n) — smallest n_chars whose cumulative count
    * reaches the rank. All arithmetic is integer except ceil(p·n),
    * which both engines evaluate identically (same double p, same
    * integer n). */
  def lengthQuantiles(sp: SparkSession, dir: String): DataFrame = {
    val counts = Engine.table(sp, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    val wAll = Window.partitionBy(col("lang"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
    val qs = Ps.map { case (name, p) =>
      min(when(col("cum") >= ceil(lit(p) * col("tot")), col("n_chars")))
        .as(name)
    }
    val aggs = max(col("tot")).as("n_docs") +: qs
    cum.groupBy(col("lang"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("lang") +: col("n_docs") +: Ps.map(p => col(p._1)): _*)
  }

  val lengthQuantilesOracle: String = {
    val qs = Ps.map { case (name, p) =>
      s"MIN(CASE WHEN cum >= CEIL($p*tot) THEN n_chars END) AS $name"
    }.mkString(",\n      ")
    s"""
    WITH counts AS (
      SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY lang, n_chars),
    cum AS (
      SELECT lang, n_chars,
        SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
        SUM(c) OVER (PARTITION BY lang) AS tot
      FROM counts)
    SELECT lang, CAST(MAX(tot) AS BIGINT) AS n_docs,
      $qs
    FROM cum GROUP BY lang"""
  }

  /** HLL++ distinct-content estimate per source — the sketch that
    * replaces COUNT(DISTINCT text) when the distinct set itself is
    * too large to shuffle: constant memory per group, one pass,
    * mergeable partials. rsd 0.02 ≈ 1.5 kB of registers per group.
    * Approximate → quality-gated against the exact distinct count
    * (relative error, StatsSpec + quality.json). */
  def approxDistinct(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("text"), rsd = 0.02).as("approx_distinct"))

  /** Sketch quantiles of n_chars per language via percentile_approx
    * (Greenwald-Khanna style compressed histogram): bounded state per
    * group regardless of value cardinality — the fallback when even
    * the (group, value) count aggregate of [[lengthQuantiles]] is too
    * wide (high-cardinality continuous values). Gated against the
    * exact quantiles. */
  def approxQuantiles(sp: SparkSession, dir: String): DataFrame = {
    val acc = lit(10000)
    Engine.table(sp, dir, "documents")
      .groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"),
        array(Ps.map(p => lit(p._2)): _*), acc).as("qs"))
      .select(col("lang") +:
        Ps.zipWithIndex.map { case ((name, _), i) =>
          col("qs").getItem(i).as(name)
        }: _*)
  }

  /** Per-source corpus profile: document count, language spread, and
    * length extremes/total — the one-pass summary a curation run
    * prints per ingest source. Integer-only (totals, not means — a
    * mean would need the exact-decimal division dance), one hash
    * aggregation. */
  def sourceProfile(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val sourceProfileOracle: String = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY source"""

  /** Pearson correlation between event value and hour-of-day, per
    * event type — the "is this metric seasonal?" profiling question.
    * All five sufficient statistics are EXACT integer sums reduced in
    * one partially-aggregated hash shuffle, and the correlation is ONE
    * final double expression evaluated on identical exact inputs by
    * both engines — the [[Exact]] discipline extended to second
    * moments. Correlation is scale-invariant, so x is the SCALED
    * integer rint(value·100) itself (2-decimal money values, same
    * argument as Exact's long mode) — never descaled: that keeps
    * every sum a 64-bit integer below 2⁵³, whose cast to double is
    * EXACT on both engines. (Decimal sums here would be a last-ulp
    * hazard: DuckDB casts decimal→double by int128→double then
    * ÷10^scale — two roundings — while Spark's BigDecimal cast rounds
    * once.) Magnitude bound: Σv² per group must stay under 2⁶³ —
    * ~10¹³ rows/group at this value range — beyond which ANSI mode
    * fails loudly rather than answering wrong, the documented Exact
    * posture. Scale: map-side combine means the exchange carries six
    * numbers per (group × partition); output is |event_type| rows. */
  def valueCorr(sp: SparkSession, dir: String): DataFrame = {
    val ev = Engine.table(sp, dir, "events")
      .select(col("event_type"),
        rint(col("value") * 100).cast("long").as("v"),
        expr("(unix_millis(ts) div 3600000) % 24").as("h"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("sx"),
        sum(col("v") * col("v")).cast("double").as("sxx"),
        sum(col("h")).cast("double").as("sy"),
        sum(col("h") * col("h")).cast("double").as("syy"),
        sum(col("v") * col("h")).cast("double").as("sxy"))
      .select(col("event_type"), col("n"),
        // degenerate groups (zero variance on either axis) → NULL on
        // both engines; Spark's IEEE inf/NaN and DuckDB's NULL-on-
        // division-by-zero would otherwise diverge
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("corr_value_hour"))
  }

  val valueCorrOracle: String = """
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) AS sx,
        CAST(CAST(SUM(v * v) AS BIGINT) AS DOUBLE) AS sxx,
        CAST(CAST(SUM(h) AS BIGINT) AS DOUBLE) AS sy,
        CAST(CAST(SUM(h * h) AS BIGINT) AS DOUBLE) AS syy,
        CAST(CAST(SUM(v * h) AS BIGINT) AS DOUBLE) AS sxy
      FROM (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v,
              (epoch_ms(ts) // 3600000) % 24 AS h
            FROM events)
      GROUP BY event_type)
    SELECT event_type, n,
      CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        THEN (n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      END AS corr_value_hour
    FROM s"""

  /** Hierarchical totals in ONE pass: GROUP BY ROLLUP(source, lang)
    * computes the (source, lang) cells, per-source subtotals and the
    * grand total together — Spark's Expand feeds all three grouping
    * sets into a single hash aggregation, so the fact rows are read
    * and shuffled once instead of three times (the naive UNION ALL of
    * three GROUP BYs). The explicit grouping() marker columns
    * distinguish a rolled-up NULL from a data NULL — without them the
    * subtotal rows would be ambiguous the day a NULL source appears.
    * Scale: output is |sources|·|langs| + |sources| + 1 rows; the
    * Expand multiplies the MAP side by the number of grouping sets
    * but partial aggregation collapses it before the exchange. */
  def rollupProfile(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "documents")
      .rollup(col("source"), col("lang"))
      .agg(grouping(col("source")).cast("long").as("g_source"),
        grouping(col("lang")).cast("long").as("g_lang"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("source"), col("lang"), col("g_source"), col("g_lang"),
        col("n_docs"), col("total_chars"))

  val rollupProfileOracle: String = """
    SELECT source, lang,
      CAST(GROUPING(source) AS BIGINT) AS g_source,
      CAST(GROUPING(lang) AS BIGINT) AS g_lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP(source, lang)"""

  private val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  /** Language × source contingency table as a PIVOT: one row per
    * source, one column per (fixed, enumerated) language. The language
    * list is pinned — never inferred from the data — so the schema is
    * deterministic and the plan is a single hash aggregation (Spark's
    * inferring pivot would run an extra distinct-values job and make
    * the output schema data-dependent, both wrong at 100 TB). Missing
    * cells are 0, not NULL (a count that observed nothing is zero).
    * Scale: shuffle carries |langs| counters per (source × partition). */
  def langPivot(sp: SparkSession, dir: String): DataFrame =
    Engine.table(sp, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .select(col("source") +:
        PivotLangs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)

  val langPivotOracle: String = {
    val cells = PivotLangs.map(l =>
      s"CAST(SUM(CASE WHEN lang='$l' THEN 1 ELSE 0 END) AS BIGINT) AS $l")
      .mkString(",\n      ")
    s"""
    SELECT source,
      $cells
    FROM documents GROUP BY source"""
  }

  /** Distribution drift per source: total-variation distance between
    * each source's language distribution and the REST of the corpus —
    * the "did this ingest source change shape?" audit. TVD is chosen
    * over chi²/KL because it stays EXACT until the last step: with
    * counts n_l (source) and m_l (rest), TVD = ½·Σ|n_l/N − m_l/M|
    * = Σ|n_l·M − m_l·N| / (2·N·M), whose numerator is a pure integer
    * sum (no per-bucket float division whose ADDITION ORDER could
    * differ between engines) and whose single final division of exact
    * integers is IEEE-deterministic. Magnitude: |n_l·M| ≤ N·M ≤ n²
    * docs² — fine below ~3·10⁹ docs per shuffle-safe long; ANSI mode
    * fails loudly beyond. Scale: one (source, lang) count aggregate
    * (|sources|·|langs| rows), everything after is broadcast-sized. */
  def sourceDrift(sp: SparkSession, dir: String): DataFrame = {
    val counts = Engine.table(sp, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val perLang = counts.groupBy(col("lang")).agg(sum(col("n")).as("tot_l"))
    val perSource = counts.groupBy(col("source")).agg(sum(col("n")).as("n_s"))
    val grand = counts.agg(sum(col("n")).as("tot"))
    // complete |sources|×|langs| grid so a language ABSENT from a
    // source still contributes its |0·M − m_l·N| term — all
    // broadcast-sized after the one count aggregate
    val grid = perSource.crossJoin(broadcast(perLang))
      .join(counts, Seq("source", "lang"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    grid.crossJoin(broadcast(grand))
      .select(col("source"), col("n_s"), col("tot"),
        abs(col("n") * (col("tot") - col("n_s")) -
          (col("tot_l") - col("n")) * col("n_s")).as("num"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        sum(col("num")).as("num_sum"), max(col("tot")).as("tot"))
      .select(col("source"), col("n_docs"),
        (col("num_sum").cast("double") /
          (lit(2.0) * col("n_docs").cast("double") *
            (col("tot") - col("n_docs")).cast("double"))).as("tvd"))
  }

  /** Two-sample Kolmogorov-Smirnov drift per source: the KS statistic
    * D = sup_v |ECDF_source(v) − ECDF_rest(v)| of document length —
    * the CONTINUOUS-distribution drift audit that complements
    * [[sourceDrift]]'s categorical TVD (a source whose lengths shifted
    * by 10% has near-zero language TVD but a large KS). Exactness
    * discipline is TVD's: with cumulative counts c_s(v) (source) and
    * c_r(v) (rest), D = max_v |c_s·M − c_r·N| / (N·M) — the sup is
    * taken over a pure-integer numerator (no per-value float division
    * whose rounding could reorder the argmax between engines) and the
    * single final division is IEEE-deterministic. The sup over all
    * reals is attained at a step, so scanning the distinct values
    * present in either sample is exact. Scale: one (source, value)
    * count aggregate; the value grid is bounded by distinct lengths ×
    * sources (the global cumulative window over per-value totals runs
    * on the tiny distribution — single-partition by design). Long
    * headroom: |c·M| ≤ N·M ≤ n² docs² — safe below ~3·10⁹ docs, ANSI
    * fails loudly beyond. */
  def ksDrift(sp: SparkSession, dir: String): DataFrame = {
    // cached: the (source × n_chars)-bounded distribution feeds FIVE
    // consumers (sources, values, grand, per-value cum, and the grid
    // join) — uncached each re-scanned documents (round 13: 5 → 1)
    // coalesce(1) before the pin: the distribution is a few thousand
    // rows feeding global-order windows (single-partition by design) —
    // leaving it at shuffle-partition width made every one of the five
    // tiny downstream stages schedule 32 near-empty tasks against the
    // cache (measured 2× the op's wall at sf0.1, round 13)
    val counts = Engine.table(sp, dir, "documents")
      .groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .cache()
    val sources = counts.groupBy(col("source")).agg(sum(col("n")).as("n_s"))
    val values = counts.select(col("n_chars")).distinct()
    val grand = counts.agg(sum(col("n")).as("tot"))
    val perValue = counts.groupBy(col("n_chars")).agg(sum(col("n")).as("nv"))
    val wAll = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cumAll = perValue
      .withColumn("cum_all", sum(col("nv")).over(wAll))
      .select(col("n_chars"), col("cum_all"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sources.crossJoin(values)
      .join(counts, Seq("source", "n_chars"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum_s", sum(col("n")).over(wSrc))
      .join(broadcast(cumAll), "n_chars")
      .crossJoin(broadcast(grand))
      .select(col("source"), col("n_s"), col("tot"),
        abs(col("cum_s") * (col("tot") - col("n_s")) -
          (col("cum_all") - col("cum_s")) * col("n_s")).as("num"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"), max(col("num")).as("max_num"),
        max(col("tot")).as("tot"))
      .select(col("source"), col("n_docs"),
        (col("max_num").cast("double") /
          (lit(1.0) * col("n_docs") * (col("tot") - col("n_docs"))))
          .as("ks"))
  }

  val ksDriftOracle: String = """
    WITH counts AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, n_chars),
    ps AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_s
           FROM counts GROUP BY source),
    vals AS (SELECT DISTINCT n_chars FROM counts),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts),
    cum_all AS (
      SELECT n_chars, SUM(nv) OVER (ORDER BY n_chars
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      FROM (SELECT n_chars, CAST(SUM(n) AS BIGINT) AS nv
            FROM counts GROUP BY n_chars)),
    grid AS (
      SELECT ps.source, ps.n_s, v.n_chars, COALESCE(c.n, 0) AS n
      FROM ps CROSS JOIN vals v
      LEFT JOIN counts c ON c.source = ps.source AND c.n_chars = v.n_chars),
    nums AS (
      SELECT gr.source, gr.n_s,
        ABS(SUM(gr.n) OVER (PARTITION BY gr.source ORDER BY gr.n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * (g.tot - gr.n_s)
          - (ca.cum_all
             - SUM(gr.n) OVER (PARTITION BY gr.source ORDER BY gr.n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            * gr.n_s) AS num,
        g.tot
      FROM grid gr
      JOIN cum_all ca ON ca.n_chars = gr.n_chars
      CROSS JOIN g)
    SELECT source, MAX(n_s) AS n_docs,
      CAST(CAST(MAX(num) AS BIGINT) AS DOUBLE)
        / (1.0 * MAX(n_s) * (MAX(tot) - MAX(n_s))) AS ks
    FROM nums GROUP BY source"""

  /** Vocabulary-growth (Heaps'-law) audit: how many NEW distinct
    * tokens each decile of the id-ordered corpus contributes, plus
    * the cumulative vocabulary — the curve that says whether a crawl
    * is still discovering language or re-ingesting what it has (its
    * flattening is the classic stop-crawling signal). Deciles are
    * arithmetic over the doc_id RANGE (ids are assigned in ingestion
    * order; min/max come from one cheap agg and the bucket is
    * row-local integer arithmetic — no rank window over N docs ever
    * runs). A token's decile is its FIRST occurrence:
    * groupBy(token) min(doc_id) — the shuffle carries one row per
    * distinct (doc, token) thanks to row-local array_distinct, and
    * everything after the min-agg is vocabulary-sized; the cumulative
    * window runs over exactly 10 rows. All-integer → hash-exact. */
  def vocabGrowth(sp: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(sp, dir, "documents")
    val bounds = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val firstDoc = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val perBucket = firstDoc.crossJoin(broadcast(bounds))
      .select((expr("(10 * (first_doc - lo)) div (hi - lo + 1)") + 1)
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_tokens"))
    // full 1..10 spine: a decile that discovered nothing still shows
    // (new_tokens 0, flat cumulative) — the flattening IS the signal
    sp.range(1, 11).select(col("id").as("bucket"))
      .join(perBucket, Seq("bucket"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(wCum))
  }

  val vocabGrowthOracle: String = """
    WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
    fd AS (
      SELECT token, MIN(doc_id) AS first_doc
      FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY token),
    bk AS (
      SELECT 1 + (10 * (first_doc - lo)) // (hi - lo + 1) AS bucket
      FROM fd CROSS JOIN b),
    pb AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_tokens
      FROM bk GROUP BY bucket)
    SELECT s.bucket, COALESCE(pb.new_tokens, 0) AS new_tokens,
      CAST(SUM(COALESCE(pb.new_tokens, 0)) OVER (ORDER BY s.bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_vocab
    FROM generate_series(1, 10) AS s(bucket) LEFT JOIN pb USING (bucket)"""

  /** Ranks fitted by [[zipfSlope]] — the Zipf head, where the
    * power-law regime lives (the tail bends for every real corpus). */
  val ZipfTopR = 100

  /** Per-source Zipf power-law fit: least-squares slope/intercept of
    * ln(freq) on ln(rank) over each source's [[ZipfTopR]] most
    * frequent tokens — the corpus-health diagnostic that catches
    * machine-generated or template text (natural language sits near
    * slope −1; boilerplate floods flatten the head, mojibake steepens
    * it). Scale shape: token counting is the [[graft.operators
    * .TextOps.tokenDf]] partial-agg shuffle (vocabulary-sized, never
    * raw occurrences); the per-source top-R is a WindowGroupLimit;
    * the regression runs over ≤ sources × R tiny rows. Determinism:
    * ln via the JVM's Math.log on both the op and the gate (libm log
    * differs across ENGINES in the last ulp — the reason this op is
    * gate-verified by driver recompute, not SQL-oracled — but within
    * one JVM it is a fixed function), and the four regression sums go
    * through [[Exact.dsum]], so they are order-free and the closing
    * slope/intercept chain is one deterministic IEEE expression. */
  def zipfSlope(sp: SparkSession, dir: String): DataFrame = {
    val tf = Engine.table(sp, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("token").asc)
    val xy = tf
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ZipfTopR)
      .select(col("source"),
        log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    xy.groupBy(col("source")).agg(
        count(lit(1)).as("n_ranks"),
        graft.operators.Exact.dsum(col("x")).as("sx"),
        graft.operators.Exact.dsum(col("y")).as("sy"),
        graft.operators.Exact.dsum(col("x") * col("y")).as("sxy"),
        graft.operators.Exact.dsum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        (col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
          (col("n_ranks") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n_ranks"))
      .select(col("source"), col("n_ranks"), col("slope"),
        col("intercept"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_zipf_slope" -> (zipfSlope _),
    "stats_vocab_growth" -> (vocabGrowth _),
    "stats_ks_drift" -> (ksDrift _),
    "stats_source_drift" -> (sourceDrift _),
    "stats_rollup_profile" -> (rollupProfile _),
    "stats_lang_pivot" -> (langPivot _),
    "stats_source_profile" -> (sourceProfile _),
    "stats_length_quantiles" -> (lengthQuantiles _),
    "stats_approx_distinct" -> (approxDistinct _),
    "stats_approx_quantiles" -> (approxQuantiles _),
    "stats_value_corr" -> (valueCorr _))

  val sourceDriftOracle: String = """
    WITH counts AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang),
    pl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot_l
           FROM counts GROUP BY lang),
    ps AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_s
           FROM counts GROUP BY source),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts),
    grid AS (
      SELECT ps.source, ps.n_s, pl.tot_l, COALESCE(c.n, 0) AS n
      FROM ps CROSS JOIN pl
      LEFT JOIN counts c ON c.source = ps.source AND c.lang = pl.lang)
    SELECT source, MAX(n_s) AS n_docs,
      CAST(CAST(SUM(ABS(n * (tot - n_s) - (tot_l - n) * n_s)) AS BIGINT)
          AS DOUBLE)
        / (2.0 * MAX(n_s) * (MAX(tot) - MAX(n_s))) AS tvd
    FROM grid CROSS JOIN g GROUP BY source"""

  val oracles: Map[String, String] = Map(
    "stats_vocab_growth" -> vocabGrowthOracle,
    "stats_ks_drift" -> ksDriftOracle,
    "stats_source_drift" -> sourceDriftOracle,
    "stats_rollup_profile" -> rollupProfileOracle,
    "stats_lang_pivot" -> langPivotOracle,
    "stats_source_profile" -> sourceProfileOracle,
    "stats_length_quantiles" -> lengthQuantilesOracle,
    "stats_value_corr" -> valueCorrOracle)
}
