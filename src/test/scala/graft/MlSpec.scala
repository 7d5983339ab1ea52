package graft

import graft.operators.{MlOps, SimilarityOps}
import org.scalatest.funsuite.AnyFunSuite

/** Distributed training harness: the logistic-regression trainer's
  * determinism contract (bit-identical refits — the quantized
  * gradient sums make the trajectory partitioning-independent), its
  * learning behavior on the language label, and the cluster-prototype
  * sampler's shape invariants. QualityGates carries the driver-refit
  * and AUC numbers into the round artifact. */
class MlSpec extends AnyFunSuite {
  import TestSession._

  test("logreg refit is bit-identical (deterministic trajectory)") {
    val (w1, l1) = MlOps.logregFit(spark, sf)
    val (w2, l2) = MlOps.logregFit(spark, sf)
    assert(w1.sameElements(w2))
    assert(l1.sameElements(l2))
  }

  test("logreg training reduces the loss and separates the label") {
    val (_, losses) = MlOps.logregFit(spark, sf)
    assert(losses.last < losses.head,
      s"loss did not fall: ${losses.head} -> ${losses.last}")
    val scored = MlOps.qualityClassifier(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val auc = pos.map(p => neg.map(q =>
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum).sum /
      (pos.length.toDouble * neg.length)
    assert(auc >= 0.9, s"AUC $auc")
  }

  test("cluster sample keeps at most M contiguously-ranked per cluster") {
    val rows = SimilarityOps.clusterSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cl, xs) =>
      assert(xs.length <= SimilarityOps.ClusterSampleM, s"cluster $cl size")
      assert(xs.map(_._2).sorted.toSeq == (1 to xs.length),
        s"cluster $cl ranks not contiguous")
    }
  }
}
