package graft

import graft.optimizer.{Spn, SpnCatalog}
import org.scalatest.funsuite.AnyFunSuite

/** SPN cardinality estimation (ref src/util/Spn.cpp + SpnEstimator):
  * the whole point is beating the per-column independence assumption
  * on correlated filters, so that is what we assert. */
class SpnSpec extends AnyFunSuite {
  import TestSession._

  /** Strongly correlated pair: y = x + small noise. */
  private def correlatedData(n: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(13)
    Array.fill(n) {
      val x = rnd.nextDouble() * 100
      Array(x, x + rnd.nextGaussian() * 2)
    }
  }

  test("SPN beats the independence assumption on a correlated filter") {
    val data = correlatedData(4000)
    val spn = Spn.learn(data, Vector("x", "y"))
    // P(x < 30 AND y < 30): truth ≈ P(x < 30) ≈ 0.30 because y ≈ x;
    // independence says ≈ 0.09
    val truth = data.count(r => r(0) < 30 && r(1) < 30).toDouble / data.length
    val pX = data.count(_(0) < 30).toDouble / data.length
    val pY = data.count(_(1) < 30).toDouble / data.length
    val indep = pX * pY
    val est = spn.estimate(Map(
      "x" -> (Double.NegativeInfinity, 30.0),
      "y" -> (Double.NegativeInfinity, 30.0)))
    val errSpn = math.abs(est - truth)
    val errIndep = math.abs(indep - truth)
    assert(errSpn < errIndep,
      s"SPN err $errSpn (est $est) not better than independence err $errIndep (est $indep), truth $truth")
  }

  test("SPN marginals stay accurate (single-column ranges)") {
    val data = correlatedData(4000)
    val spn = Spn.learn(data, Vector("x", "y"))
    val truth = data.count(_(0) < 50).toDouble / data.length
    val est = spn.estimate(Map("x" -> (Double.NegativeInfinity, 50.0)))
    assert(math.abs(est - truth) < 0.05, s"marginal est $est vs truth $truth")
  }

  test("the learn_spns instruction trains SPNs for the database in use") {
    SpnCatalog.clear()
    val session = new EngineSession(spark)
    session.execute("""
      CREATE DATABASE spndb; USE spndb;
      CREATE TABLE pts (x DOUBLE NOT NULL, y DOUBLE NOT NULL);""")
    val rows = correlatedData(500)
      .map(r => s"(${r(0)}, ${r(1)})").mkString(", ")
    session.execute(s"INSERT INTO pts VALUES $rows;")
    val r = session.execute("\\learn_spns;")
    assert(r.asInstanceOf[CommandOk].message.contains("1 tables"))
    val spn = SpnCatalog.get("spndb.pts")
    assert(spn.isDefined)
    val est = spn.get.estimate(Map(
      "x" -> (Double.NegativeInfinity, 30.0),
      "y" -> (Double.NegativeInfinity, 30.0)))
    assert(est > 0.15 && est < 0.45, s"joint estimate $est out of range")
    SpnCatalog.clear()
  }

  test("unknown instructions are rejected like the reference") {
    val session = new EngineSession(spark)
    intercept[graft.analyzer.SemaError] {
      session.execute("\\not_an_instruction;")
    }
  }

  test("SPN-fed reordering keeps results identical (correctness is invariant)") {
    SpnCatalog.clear()
    try {
      val base = operators.Relational.join5Way(spark, sf)
        .collect().map(_.toSeq.toString).sorted
      // learn SPNs over the driver tables, then rerun with the rule on
      val s = EngineSession.withTestdata(spark, sf)
      s.execute("\\learn_spns;")
      assert(SpnCatalog.keys.nonEmpty)
      spark.experimental.extraOptimizations = Seq(graft.optimizer.JoinReorderRule)
      val withSpn = operators.Relational.join5Way(spark, sf)
        .collect().map(_.toSeq.toString).sorted
      assert(withSpn.toSeq == base.toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
      SpnCatalog.clear()
    }
  }
}
