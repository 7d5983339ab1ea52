package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the `documents` table: an inverted-index
  * TF-IDF top-k search — the lexical half of a retrieval stack (the
  * dense half is `SimilarityOps`' kNN/ANN family). Part of the
  * training-data-pipeline surface (no reference counterpart; the
  * reference has no text search at all, SURVEY §0).
  *
  * Scale shape (100 TB): the query set is a tiny literal relation, so
  * the corpus token stream is pruned by a BROADCAST semi-join on
  * `token` before anything shuffles — the only exchanged rows are the
  * posting lists of the query vocabulary (an index probe, not a corpus
  * scan aggregate). Document frequency is likewise computed only for
  * query terms. Per-query top-k plans as a rank-limited window
  * (WindowGroupLimit pushes the limit before the final exchange).
  *
  * Bit-portability: no logarithms. The IDF weight is the integer
  * `(n_docs * IdfScale) div df` (floor division on both engines —
  * Spark `div`, DuckDB `//`), tf·idf products and their sums are
  * exact BIGINTs, ranking ties break on doc_id → fully oracled.
  * IdfScale keeps three leading decimal digits of n_docs/df; at a
  * corpus where n_docs·IdfScale would near 2^63 (n_docs ≳ 10^12),
  * scale IdfScale down — the ORDER of weights is what matters.
  */
object SearchOps {

  /** Fixed keyword query set (query_id → terms). A production call
    * would pass its own; fixed here so the op is self-contained and
    * oracle-comparable, same convention as SimilarityOps' fixed kNN
    * query ids. */
  val QuerySet: Seq[(String, Seq[String])] = Seq(
    "hash_join"   -> Seq("hash", "join"),
    "stream_agg"  -> Seq("window", "stream", "agg"),
    "vector_scan" -> Seq("vector", "scan"))

  val TopK = 10
  val IdfScale = 1000000L

  /** TF-IDF top-k per query: score(q,d) = Σ_{t∈q∩d} tf(t,d)·w(t),
    * w(t) = (N·IdfScale) div df(t); rank by (score DESC, doc_id). */
  def tfidfTopK(sp: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(sp, dir, "documents")
    val qTerms = {
      import sp.implicits._
      QuerySet.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("query_id", "token")
    }
    val qVocab = qTerms.select("token").distinct()

    // corpus token stream pruned to the query vocabulary BEFORE any
    // aggregation — broadcast semi-join, so at 100 TB the exchange
    // only ever carries postings of the (tiny) query vocabulary
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(broadcast(qVocab), "token")

    val tf = postings.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df(t) = |{doc : tf(t,doc) > 0}| = tf's row count per token,
    // attached as a WINDOW count (round 14). Round 13 derived df as
    // tf.groupBy(token) and joined it back expecting ReusedExchange —
    // which provably cannot fire: column pruning strips the tf count
    // from the df branch's aggregate, so the two exchange subtrees are
    // not canonically equal and the corpus scan + explode ran TWICE
    // (the committed r13 plan shows both subtrees; the op regressed
    // 1.44×). A token-partitioned window count computes the same df
    // in tf's own lineage: one corpus pass, and the exchange on token
    // the join needed anyway now also carries the df.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    // corpus size as a 1-row broadcast (plan-side, no driver action)
    val n = docs.agg(count(lit(1)).as("n_docs"))

    val scored = withDf
      .join(broadcast(qTerms), "token")
      .crossJoin(broadcast(n))
      .withColumn("w", expr(s"(n_docs * ${IdfScale}L) div df"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"),
        count(lit(1)).as("n_terms"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("doc_id"),
        col("score"), col("n_terms"))
  }

  val tfidfTopKOracle: String = {
    val values = QuerySet.flatMap { case (qid, ts) =>
      ts.map(t => s"('$qid', '$t')")
    }.mkString(", ")
    s"""
    WITH q(query_id, token) AS (VALUES $values),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    rel AS (
      SELECT t.doc_id, t.token
      FROM toks t JOIN (SELECT DISTINCT token FROM q) qt USING (token)),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM rel GROUP BY doc_id, token),
    dfx AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT doc_id, token FROM rel) GROUP BY token),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT q.query_id, tf.doc_id,
        CAST(SUM(tf.tf * ((n.n_docs * $IdfScale) // dfx.df)) AS BIGINT)
          AS score,
        CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM q JOIN tf USING (token) JOIN dfx USING (token) CROSS JOIN n
      GROUP BY q.query_id, tf.doc_id)
    SELECT query_id, rk, doc_id, score, n_terms FROM (
      SELECT query_id, doc_id, score, n_terms,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY score DESC, doc_id ASC) AS INT) AS rk
      FROM scored)
    WHERE rk <= $TopK"""
  }

  /** BM25 parameters (the Robertson/Lucene defaults). */
  val K1 = 1.2
  val B = 0.75

  /** BM25 top-k per query — what [[tfidfTopK]]'s linear tf weighting
    * can't express: term-frequency SATURATION (the 50th occurrence of
    * "hash" adds almost nothing) and document-LENGTH normalization
    * (a term hit in a short doc outranks the same hit in a long one):
    * score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) (the Lucene positive form).
    *
    * Same 100 TB shape as tf-idf: the corpus token stream is pruned by
    * a broadcast semi-join on the query vocabulary before anything
    * shuffles; per-doc length is a row-local expression joined in on
    * doc_id (the scored side is query-result-sized — at scale that
    * join broadcasts the scored side, never the lengths).
    *
    * Parity: ln() has no cross-engine bit contract (JVM Math.log vs
    * DuckDB libm), so this op is QUALITY-GATED against a driver-side
    * recompute instead of SQL-oracled. Ranking is still deterministic
    * WITHIN the engine: scores are published as rint(score·10⁶) — a
    * scaled integer coarse enough to absorb the sum-order rounding of
    * the per-term aggregation (~1 ulp) yet far finer than any real
    * score gap — and ties break on doc_id. */
  def bm25TopK(sp: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(sp, dir, "documents")
    val qTerms = {
      import sp.implicits._
      QuerySet.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("query_id", "token")
    }
    val qVocab = qTerms.select("token").distinct()
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(broadcast(qVocab), "token")
    val tf = postings.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // same single-corpus-pass df derivation as [[tfidfTopK]] (round
    // 14): a token-partitioned window count in tf's own lineage —
    // the r13 groupBy+join-back shape scanned and exploded the corpus
    // twice because column pruning defeats ReusedExchange there
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    val dl = docs.select(col("doc_id"),
      (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
        .cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val scored = withDf
      .join(broadcast(qTerms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("sat", (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) *
          (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("idf") * col("sat")).as("score"),
        count(lit(1)).as("n_terms"))
      .withColumn("score_scaled", rint(col("score") * lit(1e6)).cast("long"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("doc_id"),
        col("score_scaled"), col("n_terms"))
  }

  /** Fixed phrase set for [[phraseHits]]. */
  val PhraseSet: Seq[String] = Seq("hash join", "sort merge", "fast scan")

  /** Exact multi-word PHRASE search — what [[tfidfTopK]]'s bag-of-
    * words scoring can't express: per phrase, how many documents
    * contain it and how often in total. Counting uses the
    * replace-and-measure trick on space-padded text (exact integer
    * arithmetic, identical non-overlapping left-to-right semantics in
    * Spark and DuckDB — the TextOps convention). One shuffle-free
    * corpus pass computes every phrase's per-doc counts as parallel
    * column expressions; the global rollup exchanges |phrases| rows
    * per partition. Fully oracled. */
  def phraseHits(sp: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val perDoc = Engine.table(sp, dir, "documents").select(
      PhraseSet.zipWithIndex.map { case (p, i) =>
        ((length(padded) - length(replace(padded, lit(s" $p "), lit(" ")))) /
          (p.length + 1)).cast("long").as(s"c$i")
      }: _*)
    val rows = PhraseSet.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("phrase"), col(s"c$i").as("c"))
    }
    perDoc.select(explode(array(rows: _*)).as("r"))
      .select(col("r.phrase").as("phrase"), col("r.c").as("c"))
      .groupBy(col("phrase"))
      .agg(sum(when(col("c") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("c")).as("n_occurrences"))
  }

  val phraseHitsOracle: String = {
    val arms = PhraseSet.map { p =>
      s"""SELECT '$p' AS phrase,
        CAST((LENGTH(padded) - LENGTH(REPLACE(padded, ' $p ', ' ')))
          / ${p.length + 1} AS BIGINT) AS c
      FROM (SELECT ' ' || text || ' ' AS padded FROM documents)"""
    }.mkString("\nUNION ALL\n")
    s"""
    SELECT phrase,
      CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      CAST(SUM(c) AS BIGINT) AS n_occurrences
    FROM ($arms)
    GROUP BY phrase"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_tfidf_topk" -> (tfidfTopK _),
    "search_bm25_topk" -> (bm25TopK _),
    "search_phrase_hits" -> (phraseHits _))

  val oracles: Map[String, String] = Map(
    "search_tfidf_topk" -> tfidfTopKOracle,
    "search_phrase_hits" -> phraseHitsOracle)
}
