package graft

import graft.operators.DedupOps
import graft.tools.ScaleBench
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 10×/100× scale proof (SCALEBENCH*.json) rests on two claims
  * about the derived corpus: each copy's internal duplicate structure
  * is EXACTLY the base corpus's, and copies never look similar to
  * each other. This spec pins both, so the scaling methodology is
  * itself under test, not just asserted in comments. */
class ScaleDerivationSpec extends AnyFunSuite {
  import TestSession._

  private val Off = 10000000L
  private lazy val dir: String = {
    val out = "/tmp/graft_scale_spec_x2"
    // rebuild every run: a stale dir from an older derivation rule
    // would silently test the wrong construction
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(out))
    ScaleBench.derive(spark, sf, out, 2)
    out
  }

  test("word-suffix copies preserve n-gram dup pairs exactly and never straddle copies") {
    val pairs = DedupOps.ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs.filter { case (a, b) => a < Off && b < Off }
    val copy1 = pairs.collect {
      case (a, b) if a >= Off && b >= Off => (a - Off, b - Off)
    }
    val straddle = pairs.filter { case (a, b) => (a < Off) != (b < Off) }
    assert(base.nonEmpty, "vacuous: base corpus has no jaccard pairs")
    assert(copy1 == base,
      s"copy-1 pair structure diverged: only-base ${(base -- copy1).take(3)}, " +
        s"only-copy ${(copy1 -- base).take(3)}")
    assert(straddle.isEmpty, s"cross-copy pairs: ${straddle.take(3)}")
  }

  test("derived documents keep the n_chars = length(text) invariant") {
    // the per-word perturbation suffix grows every word, so copies
    // must RECOMPUTE n_chars — an op consuming n_chars added to
    // ScaleBench.Ops later would otherwise run on inconsistent data
    val bad = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("n_chars") =!= length(col("text")).cast("long")).count()
    assert(bad == 0, s"$bad derived docs with stale n_chars")
  }

  test("sign-flip copies preserve within-copy cosines bit-exactly, cross-copy at background") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); sa += a(i) * a(i); sb += b(i) * b(i); i += 1 }
      s / math.sqrt(sa * sb)
    }
    val baseIds = vecs.keys.filter(_ < Off).toSeq.sorted.take(20)
    for (Seq(i, j) <- baseIds.combinations(2)) {
      val b = cos(vecs(i), vecs(j))
      val c = cos(vecs(i + Off), vecs(j + Off))
      // s_d² = 1 → identical products in identical order → bit-equal
      assert(b == c, s"within-copy cosine drifted for ($i,$j): $b vs $c")
      val cross = cos(vecs(i), vecs(i + Off))
      assert(math.abs(cross) < 0.6,
        s"cross-copy self-cosine not at background for $i: $cross")
    }
  }
}
