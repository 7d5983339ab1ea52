package graft.optimizer

import org.apache.spark.sql.{DataFrame, functions => F}

/** Sum-product network over a table sample for cardinality estimation —
  * the idea of the reference's SPN estimator (ref /root/reference/
  * src/util/Spn.cpp, 957 LoC; SpnWrapper src/catalog/SpnWrapper.hpp;
  * used by `SpnEstimator`, include/mutable/catalog/
  * CardinalityEstimator.hpp:323). Unlike per-column histograms with an
  * independence assumption, the SPN captures cross-column correlation:
  *
  *  - **Sum** nodes split ROWS into clusters (here: 2-means), children
  *    weighted by cluster mass (ref Spn.cpp row clustering);
  *  - **Product** nodes split COLUMNS into groups that are
  *    approximately independent (|Pearson corr| below a threshold —
  *    ref uses an RDC-based test, same role);
  *  - **Leaf** nodes are per-column equi-width histograms.
  *
  * `estimate` returns the selectivity of a conjunction of per-column
  * range predicates. Training runs on a driver-side SAMPLE (bounded
  * rows × numeric columns), matching the reference's design where SPNs
  * are learned once per table by the `learn_spns` instruction — never
  * a full-corpus pass at query time. */
final class Spn private (root: Spn.Node, val colNames: Vector[String],
    sampleRows: Int, scaleUp: Double) {

  private def this(root: Spn.Node, colNames: Vector[String]) =
    this(root, colNames, 0, 1.0)

  /** Selectivity of `AND`-ed per-column ranges, keyed by column name:
    * (lo, hi) inclusive bounds (use ±∞ for one-sided). */
  def estimate(ranges: Map[String, (Double, Double)]): Double = {
    val byIdx = ranges.flatMap { case (n, r) =>
      val i = colNames.indexWhere(_.equalsIgnoreCase(n))
      if (i >= 0) Some(i -> r) else None
    }
    if (byIdx.isEmpty) 1.0 else Spn.eval(root, byIdx)
  }

  /** Estimated distinct-value count of one column, the ingredient of
    * the reference's SPN join estimate (`Spn::
    * estimate_number_distinct_values`, ref src/util/Spn.cpp:946 — Sum
    * nodes sum their children's counts (:138), Product nodes route to
    * the group owning the attribute (:199), leaves count observed
    * values). `None` when the column is not covered by the model — the
    * reference treats an uncovered join attribute as a primary key
    * (CardinalityEstimator.cpp:559, max-frequency 1), and callers here
    * do the same.
    *
    * Sample → table scale-up: when the model was trained on a sample,
    * a near-unique column (mean per-value frequency < 2 in the sample)
    * is assumed unique-ish in the table and its count scales with the
    * sample fraction; a low-cardinality column's count is carried over
    * unscaled (10 distinct flags in a 10k sample are still ~10 in the
    * full table). */
  def estimateDistinct(col: String): Option[Double] = {
    val i = colNames.indexWhere(_.equalsIgnoreCase(col))
    if (i < 0) None
    else {
      val d = math.max(1.0, Spn.distinctOf(root, i))
      val freq = if (d > 0) sampleRows / d else Double.PositiveInfinity
      Some(if (scaleUp > 1.0 && freq < 2.0) d * scaleUp else d)
    }
  }

  /** Full-table row estimate (sample rows × scale-up) — the model's
    * `num_rows`, backing the primary-key fallback below. */
  def numRows: Double = math.max(1.0, sampleRows * scaleUp)

  /** Grouped cardinality = Π per-key distinct counts, mirroring ref
    * `SpnEstimator::estimate_grouping` (src/catalog/
    * CardinalityEstimator.cpp:646-669, interface hpp:102-112): each
    * group key contributes its estimated distinct-value count; a key
    * the model does not cover is treated as a primary key and
    * contributes `num_rows` (ref :665). An empty key set is the
    * global aggregate's single group. Callers that know the input's
    * (possibly filtered) cardinality should cap the product with it —
    * a group count can never exceed the grouped row count. */
  def estimateGrouping(cols: Seq[String]): Double =
    if (cols.isEmpty) 1.0
    else cols.map(c => estimateDistinct(c).getOrElse(numRows)).product
}

object Spn {
  /** Limit caps cardinality: `min(card − offset, limit)` — ref
    * `SpnEstimator::estimate_limit` (src/catalog/CardinalityEstimator
    * .cpp:639-644), with the offset subtraction of
    * `CartesianProductEstimator::estimate_limit` (:89-97). Pure
    * arithmetic, shared by every estimator kind. */
  def estimateLimit(card: Double, limit: Long, offset: Long = 0L): Double =
    math.min(math.max(0.0, card - offset), math.max(0L, limit).toDouble)

  sealed trait Node
  final case class SumNode(children: Vector[Node], weights: Vector[Double]) extends Node
  final case class ProductNode(children: Vector[Node]) extends Node
  /** Equi-width histogram over one column (by global column index).
    * `distinct` is the observed distinct-value count of the leaf's
    * rows, serving `estimate_number_distinct_values` (ref
    * Spn.cpp:349,547). */
  final case class LeafNode(col: Int, lo: Double, hi: Double,
      bins: Vector[Double], distinct: Double) extends Node // bins sum to 1

  private val MinRowsToSplit = 64
  private val CorrThreshold = 0.3
  private val NumBins = 32

  private[optimizer] def eval(n: Node, ranges: Map[Int, (Double, Double)]): Double = n match {
    case SumNode(cs, ws) =>
      cs.zip(ws).map { case (c, w) => w * eval(c, ranges) }.sum
    case ProductNode(cs) => cs.map(eval(_, ranges)).product
    case LeafNode(col, lo, hi, bins, _) =>
      ranges.get(col) match {
        case None => 1.0
        case Some((qlo, qhi)) =>
          if (qhi < lo || qlo > hi) 0.0
          else if (hi == lo) if (qlo <= lo && lo <= qhi) 1.0 else 0.0
          else {
            val w = (hi - lo) / bins.length
            bins.indices.map { b =>
              val (blo, bhi) = (lo + b * w, lo + (b + 1) * w)
              val overlap = math.max(0.0,
                math.min(bhi, qhi) - math.max(blo, qlo))
              bins(b) * (overlap / w)
            }.sum
          }
      }
  }

  /** Distinct-count walk (ref Spn.cpp:946): Sum sums children (:138 —
    * clusters partition the rows, so per-cluster counts add, at worst
    * double-counting values spanning clusters like the reference),
    * Product routes to the child group owning the column (:199). */
  private[optimizer] def distinctOf(n: Node, col: Int): Double = n match {
    case SumNode(cs, _) => cs.map(distinctOf(_, col)).sum
    case ProductNode(cs) =>
      cs.find(covers(_, col)).map(distinctOf(_, col)).getOrElse(1.0)
    case LeafNode(c, _, _, _, d) => if (c == col) d else 1.0
  }

  private def covers(n: Node, col: Int): Boolean = n match {
    case SumNode(cs, _) => cs.exists(covers(_, col))
    case ProductNode(cs) => cs.exists(covers(_, col))
    case LeafNode(c, _, _, _, _) => c == col
  }

  /** Learn an SPN from a numeric matrix (rows × cols). `tableRows` is
    * the full table's row count when `data` is a sample of it — used to
    * scale distinct-count estimates (see [[Spn.estimateDistinct]]). */
  def learn(data: Array[Array[Double]], colNames: Vector[String],
      tableRows: Long = 0L): Spn = {
    def leafFor(rows: Array[Array[Double]], col: Int): LeafNode = {
      val vs = rows.map(_(col))
      val lo = vs.min; val hi = vs.max
      val bins = Array.fill(NumBins)(0.0)
      if (hi == lo) bins(0) = vs.length.toDouble
      else vs.foreach { v =>
        val b = math.min(NumBins - 1, ((v - lo) / (hi - lo) * NumBins).toInt)
        bins(b) += 1.0
      }
      LeafNode(col, lo, hi, bins.map(_ / vs.length).toVector,
        vs.distinct.length.toDouble)
    }

    def corr(rows: Array[Array[Double]], a: Int, b: Int): Double = {
      val n = rows.length.toDouble
      val (xs, ys) = (rows.map(_(a)), rows.map(_(b)))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val (vx, vy) = (xs.map(x => (x - mx) * (x - mx)).sum,
        ys.map(y => (y - my) * (y - my)).sum)
      if (vx == 0 || vy == 0) 0.0 else cov / math.sqrt(vx * vy)
    }

    /** Partition columns into connected groups of |corr| ≥ threshold. */
    def independentGroups(rows: Array[Array[Double]], cols: Vector[Int]): Vector[Vector[Int]] = {
      val adj = (for {
        i <- cols; j <- cols if i < j
        if math.abs(corr(rows, i, j)) >= CorrThreshold
      } yield (i, j)).toSet
      val groups = collection.mutable.Buffer.empty[collection.mutable.Set[Int]]
      cols.foreach { c =>
        val touching = groups.filter(g => g.exists(o =>
          adj.contains((math.min(c, o), math.max(c, o)))))
        if (touching.isEmpty) groups += collection.mutable.Set(c)
        else {
          val merged = touching.head
          touching.tail.foreach { g => merged ++= g; groups -= g }
          merged += c
        }
      }
      groups.map(_.toVector.sorted).toVector
    }

    /** 2-means over the given columns, returns row partition. */
    def cluster2(rows: Array[Array[Double]], cols: Vector[Int])
        : (Array[Array[Double]], Array[Array[Double]]) = {
      val dim = cols.length
      // normalize per column to equalize scales
      val los = cols.map(c => rows.map(_(c)).min)
      val his = cols.map(c => rows.map(_(c)).max)
      def vec(r: Array[Double]): Array[Double] =
        Array.tabulate(dim) { k =>
          val (l, h) = (los(k), his(k))
          if (h == l) 0.0 else (r(cols(k)) - l) / (h - l)
        }
      var c0 = vec(rows.head)
      var c1 = vec(rows.last)
      var assign: Array[Boolean] = null
      var iter = 0
      while (iter < 8) {
        assign = rows.map { r =>
          val v = vec(r)
          def d(c: Array[Double]) =
            v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          d(c1) < d(c0)
        }
        def centroid(sel: Boolean): Array[Double] = {
          val sub = rows.zip(assign).collect { case (r, s) if s == sel => vec(r) }
          if (sub.isEmpty) Array.fill(dim)(0.0)
          else Array.tabulate(dim)(k => sub.map(_(k)).sum / sub.length)
        }
        c0 = centroid(false); c1 = centroid(true)
        iter += 1
      }
      (rows.zip(assign).collect { case (r, false) => r },
        rows.zip(assign).collect { case (r, true) => r })
    }

    def build(rows: Array[Array[Double]], cols: Vector[Int]): Node = {
      if (cols.length == 1) return leafFor(rows, cols.head)
      val groups = independentGroups(rows, cols)
      if (groups.length > 1)
        ProductNode(groups.map(g => build(rows, g)))
      else if (rows.length >= MinRowsToSplit) {
        val (a, b) = cluster2(rows, cols)
        if (a.isEmpty || b.isEmpty)
          ProductNode(cols.map(c => leafFor(rows, c)))
        else {
          val n = rows.length.toDouble
          SumNode(Vector(build(a, cols), build(b, cols)),
            Vector(a.length / n, b.length / n))
        }
      } else
        // too few rows to split: fall back to independence
        ProductNode(cols.map(c => leafFor(rows, c)))
    }

    new Spn(build(data, colNames.indices.toVector), colNames,
      data.length, if (tableRows > data.length) tableRows.toDouble / data.length else 1.0)
  }

  /** Learn from a DataFrame's numeric/date columns on a bounded
    * deterministic sample (driver-side matrix ≤ maxRows). */
  def learnFrom(df: DataFrame, maxRows: Int = 10000): Spn = {
    import org.apache.spark.sql.types._
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
      case f if f.dataType == DateType => f.name
    }.toVector
    require(numCols.nonEmpty, "SPN needs at least one numeric column")
    val proj = df.select(numCols.map { c =>
      (df.schema(c).dataType match {
        case DateType => F.unix_date(F.col(c))
        case _ => F.col(c)
      }).cast("double").as(c)
    }: _*)
    val n = proj.count()
    val sampled = if (n <= maxRows) proj
      else proj.sample(withReplacement = false, maxRows.toDouble / n, seed = 7)
    val data = sampled.na.drop().collect()
      .map(r => Array.tabulate(numCols.length)(i =>
        if (r.isNullAt(i)) 0.0 else r.getDouble(i)))
    learn(data, numCols, tableRows = n)
  }
}

/** Session-level registry of learned SPNs: `dbName.table` → Spn (the
  * role of the reference's per-Database SPN map populated by the
  * `learn_spns` instruction, src/catalog/DatabaseCommand.cpp:23-48). */
object SpnCatalog {
  private val spns = new java.util.concurrent.ConcurrentHashMap[String, Spn]()
  def put(key: String, spn: Spn): Unit = spns.put(key.toLowerCase, spn)
  def get(key: String): Option[Spn] = Option(spns.get(key.toLowerCase))
  def clear(): Unit = spns.clear()
  def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    spns.keySet().asScala.toSeq
  }
}
