package graft.optimizer

import graft.optimizer.JoinReorder._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Trained cost function (ref /root/reference/src/catalog/
  * CostModel.cpp:91-310, `TrainedCostFunction` CostModel.cpp:313-340):
  * instead of C_out's "Σ intermediate cardinalities" proxy, fit
  * per-operator-shape linear models — wall milliseconds as a function
  * of operator features — on a SEEDED microbenchmark suite run against
  * the live engine, then cost a join tree as the sum of its operators'
  * predicted times.
  *
  * The reference grids (cardinality × selectivity) per shape and fits
  * with Eigen least squares; we grid (build rows × probe rows ×
  * key multiplicity) for joins and (rows) for scans on
  * `spark.range`-generated data, and fit by normal equations (the
  * feature count is 4 — a 4×4 solve in plain Scala).
  *
  * Join features mirror the physics of a shuffle hash/sort join:
  * constant stage overhead, linear input volume, linear output
  * materialization, and an n·log n sort/build term that makes the
  * model deliberately NON-linear in cardinalities — affine-in-cards
  * models provably rank plans identically to C_out (the sum of join
  * inputs is plan-invariant given consistent estimates), so the
  * convex term is what lets a trained model disagree with C_out.
  */
object TrainedCost {

  /** y ≈ coef · features. */
  final case class LinModel(coef: Array[Double]) {
    def predict(f: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < coef.length) { s += coef(i) * f(i); i += 1 }
      math.max(0.0, s)
    }
  }

  final case class Models(scan: LinModel, join: LinModel)

  private def nlogn(x: Double): Double = {
    val v = math.max(1.0, x)
    v * math.log(v)
  }

  def scanFeatures(rows: Double): Array[Double] = Array(1.0, rows)

  def joinFeatures(l: Double, r: Double, out: Double): Array[Double] =
    Array(1.0, l + r, out, nlogn(l) + nlogn(r))

  /** Ordinary least squares via normal equations (AᵀA x = Aᵀy),
    * Gaussian elimination with partial pivoting — the feature count is
    * tiny, numerical finesse is unnecessary. */
  def fit(rows: Seq[(Array[Double], Double)]): LinModel = {
    val k = rows.head._1.length
    val ata = Array.ofDim[Double](k, k)
    val aty = new Array[Double](k)
    for ((f, y) <- rows; i <- 0 until k) {
      aty(i) += f(i) * y
      for (j <- 0 until k) ata(i)(j) += f(i) * f(j)
    }
    // ridge epsilon keeps the solve stable when a feature is constant
    for (i <- 0 until k) ata(i)(i) += 1e-9
    val x = aty.clone()
    for (col <- 0 until k) {
      var p = col
      for (r2 <- col + 1 until k)
        if (math.abs(ata(r2)(col)) > math.abs(ata(p)(col))) p = r2
      val tmp = ata(col); ata(col) = ata(p); ata(p) = tmp
      val ty = x(col); x(col) = x(p); x(p) = ty
      for (r2 <- col + 1 until k) {
        val m = ata(r2)(col) / ata(col)(col)
        for (c2 <- col until k) ata(r2)(c2) -= m * ata(col)(c2)
        x(r2) -= m * x(col)
      }
    }
    for (col <- (k - 1) to 0 by -1) {
      var s = x(col)
      for (c2 <- col + 1 until k) s -= ata(col)(c2) * x(c2)
      x(col) = s / ata(col)(col)
    }
    LinModel(x)
  }

  /** Run the seeded microbenchmark suite, returning raw samples:
    * (scan rows, ms) and ((left, right, out), ms). Split out of
    * [[train]] so `graft.tools.CostFixtureRecorder` can dump the
    * samples of an idle-host run into the committed deterministic
    * test fixture (TrainedCostSpec's ranking check must not depend on
    * live wall clock under suite load). */
  def microbench(spark: SparkSession)
      : (Seq[(Double, Double)], Seq[((Double, Double, Double), Double)]) = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: JIT + codegen for both shapes
    noop(spark.range(10000).toDF("id"))
    noop(spark.range(1000).toDF("id").withColumn("k", col("id") % 100)
      .join(spark.range(1000).toDF("id2").withColumn("k", col("id2") % 100), "k"))

    // scan cost must actually scale with rows to be learnable: hash a
    // derived column so per-row work dominates the fixed job overhead
    val scanRows = Seq(1e5, 4e6, 1.6e7, 3.2e7).map { n =>
      val ms = (1 to 2).map(_ => time(noop(
        spark.range(n.toLong).select(xxhash64(col("id")).as("h"))))).min
      (n, ms)
    }

    // join grid: (left rows, right rows, key multiplicity) — the
    // multiplicity controls output cardinality like the reference's
    // selectivity axis controls filter output
    val joinGrid = Seq(
      (1e5, 1e5, 1.0), (1e5, 1e5, 4.0),
      (4e5, 1e5, 1.0), (1e5, 4e5, 1.0),
      (4e5, 4e5, 1.0), (4e5, 4e5, 2.0),
      (1e6, 1e5, 1.0), (1e6, 1e6, 1.0))
    val joinRows = joinGrid.map { case (l, r, mult) =>
      // keys 0..l/mult over the left, matching right keys: out ≈ r·mult
      val keys = math.max(1L, (l / mult).toLong)
      def side(n: Double, name: String) = spark.range(n.toLong)
        .select((col("id") % keys).as(s"k"), col("id").as(name))
      val out = r * mult
      val ms = (1 to 2).map(_ => time(noop(
        side(l, "a").join(side(r, "b"), "k")))).min
      ((l, r, out), ms)
    }
    (scanRows, joinRows)
  }

  /** Fit models from raw microbench samples (shared by the live
    * [[train]] path and the committed-fixture path). */
  def fitFromSamples(scan: Seq[(Double, Double)],
      join: Seq[((Double, Double, Double), Double)]): Models =
    Models(
      fit(scan.map { case (n, ms) => (scanFeatures(n), ms) }),
      fit(join.map { case ((l, r, out), ms) => (joinFeatures(l, r, out), ms) }))

  /** Run the seeded microbenchmark suite and fit the models. The data
    * is `spark.range`-generated (deterministic), timings are wall
    * clock on the live session — like the reference, training measures
    * THE engine it will cost. ~15 s at the default grid. */
  def train(spark: SparkSession): Models = {
    val (scanRows, joinRows) = microbench(spark)
    fitFromSamples(scanRows, joinRows)
  }

  /** The pluggable cost model: C_out (the default) or trained. */
  trait CostModel { def apply(t: JoinTree): Double; def name: String }

  object CoutModel extends CostModel {
    val name = "Cout"
    def apply(t: JoinTree): Double = t.cost
  }

  final class TrainedCostFunction(m: Models) extends CostModel {
    val name = "Trained"
    def apply(t: JoinTree): Double = t match {
      case Leaf(r) => m.scan.predict(scanFeatures(r.card))
      case Node(l, r, card) =>
        apply(l) + apply(r) + m.join.predict(joinFeatures(l.card, r.card, card))
    }
  }

  /** Subset DP under an arbitrary per-operator-additive cost model.
    * Tries BOTH orientations of every split — trained models may be
    * asymmetric in (build, probe), which C_out never is. */
  final class CostBasedDP(cm: CostModel) extends PlanEnumerator {
    val name = s"CostBasedDP(${cm.name})"
    def enumerate(g: JoinGraph): JoinTree = {
      val n = g.rels.length
      require(n <= 20, "CostBasedDP is exponential; guard small n")
      val best = new Array[JoinTree](1 << n)
      g.rels.foreach(r => best(1 << r.idx) = Leaf(r))
      var m = 1
      while (m < (1 << n)) {
        if (Integer.bitCount(m) > 1) {
          var o = m & -m
          while (o != m) {
            val comp = m ^ o
            val (lt, rt) = (best(o), best(comp))
            if (lt != null && rt != null) {
              // both orientations: the model may be asymmetric
              for (cand <- Seq(Node(lt, rt, joinedCardOf(g, lt, rt)),
                               Node(rt, lt, joinedCardOf(g, rt, lt))))
                if (best(m) == null || cm(cand) < cm(best(m))) best(m) = cand
            }
            o = (o - m) & m
          }
        }
        m += 1
      }
      best((1 << n) - 1)
    }
  }

  // expose the package-private card model for the cost-based DP
  private def joinedCardOf(g: JoinGraph, l: JoinTree, r: JoinTree): Double = {
    val conn = g.edges.exists { case (x, y, _) =>
      (l.set.contains(x) && r.set.contains(y)) ||
        (l.set.contains(y) && r.set.contains(x))
    }
    if (conn) JoinGraph.joinCard(l.card, r.card) else l.card * r.card
  }
}
