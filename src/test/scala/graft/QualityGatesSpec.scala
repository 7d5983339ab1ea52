package graft

import graft.tools.QualityGates
import org.scalatest.funsuite.AnyFunSuite

/** The quality gates (quantitative recall/precision/error for the 9
  * no-oracle approximate ops, scored vs their exact twins) must all
  * pass at the test SF, and the JSON emission must be well-formed. */
class QualityGatesSpec extends AnyFunSuite {
  import TestSession._

  private lazy val gates = QualityGates.compute(spark, sf)

  test("every no-oracle query carries at least one gate") {
    val gated = gates.map(_.query).toSet
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // dedup_minhash_lsh etc.; streaming twin + media stubs are oracled
    val expected = Set("dedup_minhash_lsh", "dedup_simhash", "sim_ann_lsh",
      "sim_ann_ivf", "sim_ann_pq", "sim_neardup_lsh", "sim_pq_encode",
      "media_byte_entropy", "text_fingerprint", "text_compression_ratio",
      "search_bm25_topk", "sim_knn_graph", "embed_pca_project")
    assert(expected.subsetOf(noOracle), s"oracle status drifted: $noOracle")
    assert(expected.subsetOf(gated), s"ungated: ${expected -- gated}")
  }

  test("all gates pass at sf0.001") {
    val failing = gates.filterNot(_.pass)
    assert(failing.isEmpty, failing.map(g =>
      s"${g.query}/${g.metric}=${g.value} < ${g.threshold}").mkString("; "))
  }

  test("JSON emission is well-formed and complete") {
    val json = QualityGates.toJson(gates)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(gates.forall(g => json.contains(s""""query":"${g.query}"""")))
    // every value is a finite number (NaN would serialize unparsable)
    assert(gates.forall(g => !g.value.isNaN && !g.value.isInfinite))
  }
}
