package graft

import graft.optimizer.{CardinalityGen, JoinReorder}
import graft.optimizer.CardinalityGen.Config
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic-cardinality generator (ref src/cardinality_gen.cpp)
  * must produce deterministic, internally consistent subproblem
  * tables, round-trip through the injection JSON, and actually steer
  * the enumerators when injected. */
class CardinalityGenSpec extends AnyFunSuite {

  private val chain5 = Seq((0, 1), (1, 2), (2, 3), (3, 4))
  private val star5 = Seq((0, 1), (0, 2), (0, 3), (0, 4))

  test("deterministic in seed and graph; seed changes the table") {
    val a = CardinalityGen.generate(5, chain5, Config(seed = 7))
    val b = CardinalityGen.generate(5, chain5, Config(seed = 7))
    val c = CardinalityGen.generate(5, chain5, Config(seed = 8))
    assert(a == b)
    assert(a != c)
  }

  test("covers singletons and exactly the connected subsets") {
    val t = CardinalityGen.generate(4, Seq((0, 1), (1, 2), (2, 3)), Config())
    // chain: connected subsets are the contiguous ranges
    val expected = (for {
      lo <- 0 until 4; hi <- lo until 4
    } yield (lo to hi).toSet).toSet
    assert(t.keySet == expected)
    // e.g. {0,2} is disconnected and must be absent
    assert(!t.contains(Set(0, 2)))
  }

  test("correlated: monotone upper bounds hold on every split") {
    for (edges <- Seq(chain5, star5); seed <- Seq(1L, 42L, 99L)) {
      val cfg = Config(seed = seed, correlated = true)
      val t = CardinalityGen.generate(5, edges, cfg)
      t.foreach { case (s, c) =>
        assert(c >= 1, s"$s rolled $c below 1")
        if (s.size == 1)
          assert(c >= cfg.minCard && c <= cfg.maxCard, s"singleton $s out of range: $c")
        else
          assert(c <= cfg.maxCard * cfg.maxCard)
      }
      // |S1 ∪ S2| ≤ |S1|·|S2| for every joined split present
      for {
        (s, c) <- t if s.size >= 2
        (s1, c1) <- t if s1.subsetOf(s) && s1.nonEmpty && s1 != s
        s2 = s -- s1
        c2 <- t.get(s2)
        if edges.exists { case (a, b) =>
          (s1.contains(a) && s2.contains(b)) || (s1.contains(b) && s2.contains(a))
        }
      } assert(c <= c1 * c2 + 1, // +1 absorbs toLong truncation
        s"correlated bound violated: |$s|=$c > |$s1|·|$s2|=${c1 * c2}")
    }
  }

  test("uncorrelated: per-edge selectivities compose multiplicatively") {
    // generous max so no clamping perturbs the closed form
    val cfg = Config(seed = 5, minCard = 100, maxCard = 1000000L,
      alpha = 2.0, correlated = false)
    val t = CardinalityGen.generate(4, Seq((0, 1), (1, 2), (2, 3)), cfg)
    def sel(a: Set[Int], b: Set[Int]): Double =
      t(a ++ b).toDouble / (t(a).toDouble * t(b).toDouble)
    // the edge (1,2) has one selectivity no matter which side grows
    val s12 = sel(Set(1), Set(2))
    val s12ctx = t(Set(0, 1, 2)).toDouble / (t(Set(0, 1)).toDouble * t(Set(2)))
    assert(math.abs(s12 - s12ctx) / s12 < 0.02,
      s"edge selectivity not stable: $s12 vs $s12ctx")
  }

  test("JSON round-trips and matches the reference shape") {
    val names = IndexedSeq("a", "b", "c")
    val t = CardinalityGen.generate(3, Seq((0, 1), (1, 2)), Config(seed = 3))
    val json = CardinalityGen.emitJson("mydb", names, t)
    assert(json.contains("\"relations\""))
    assert(json.contains("\"size\""))
    val parsed = CardinalityGen.parseJson(json)
    assert(parsed.keySet == Set("mydb"))
    val byNames = parsed("mydb")
    assert(byNames.size == t.size)
    t.foreach { case (s, c) =>
      assert(byNames(s.map(names)) == c)
    }
    // and back to index keys for the enumerators
    val inj = CardinalityGen.injectFor(names, byNames)
    assert(inj(Set(0, 1)) == t(Set(0, 1)).toDouble)
  }

  test("injected subproblem cards steer the enumerators and keep optimality") {
    import JoinReorder._
    val cards = Vector(1000.0, 50.0, 2000.0, 10.0, 700.0)
    val rels = cards.zipWithIndex.map { case (c, i) => Rel(null, c, i) }
    val edges = chain5.map { case (a, b) =>
      (a, b, null: org.apache.spark.sql.catalyst.expressions.Expression)
    }
    val table = CardinalityGen.generate(5, chain5, Config(seed = 11))
    val inject = table.map { case (s, c) => s -> c.toDouble }
    val base = JoinGraph(rels, edges, Nil)
    val injected = JoinGraph(rels, edges, Nil, inject)

    // every exact DP agrees within the CONNECTED plan space (ref
    // PlanEnumerator.cpp:92-93,:225 — cross products live in PEall
    // only, ref :33), and PEall can only match or beat them by
    // taking an injected-cheap cross product
    val dpInj = DPsize.enumerate(injected)
    for (en <- Seq(DPsub, DPccp, DPsizeOpt, DPsizeSub, DPsubOpt))
      assert(math.abs(en.enumerate(injected).cost - dpInj.cost) < 1e-6,
        s"${en.name} must agree with DPsize under the injected estimator")
    assert(PEall.enumerate(injected).cost <= dpInj.cost + 1e-6,
      "PEall's larger plan space can never be worse")
    // the injected estimate genuinely replaces the independence formula
    val dpBase = DPsize.enumerate(base)
    assert(math.abs(dpBase.cost - dpInj.cost) > 1.0,
      "injection had no effect on plan costs")
  }
}
