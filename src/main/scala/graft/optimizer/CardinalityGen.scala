package graft.optimizer

import scala.collection.mutable

/** Synthetic-cardinality generator for optimizer experiments — the
  * Spark-native analogue of the reference's `cardinality_gen` tool
  * (ref src/cardinality_gen.cpp): given a join graph, roll seeded
  * base-table cardinalities from a skew distribution, then derive a
  * cardinality for every connected subproblem, either
  *
  *  - **correlated** (ref generate_correlated_cardinalities,
  *    cardinality_gen.cpp:218): each connected subproblem S gets a
  *    fresh roll bounded above by the minimum product
  *    |S1|·|S2| over its connected two-way splits — so selectivities
  *    compound consistently along every join path, or
  *  - **uncorrelated** (ref generate_uncorrelated_cardinalities,
  *    :269): one target result cardinality, per-edge selectivities
  *    rolled around the geometric average (each edge's RNG seeded
  *    from its endpoint names, as in the ref), and
  *    |S| = Π base · Π selectivity(edges inside S), clamped once.
  *
  * Output is the reference's injection JSON shape
  * (`{"db": [{"relations": [...], "size": N}, ...]}`) consumed by
  * [[JoinReorder.JoinGraph.inject]] — the per-subproblem
  * InjectionCardinalityEstimator.
  */
object CardinalityGen {

  final case class Config(seed: Long = 42L, minCard: Long = 10L,
      maxCard: Long = 10000L, alpha: Double = 3.0,
      correlated: Boolean = true)

  /** Values in [0,1] skewed toward 0 for alpha > 1 (uniform at 1,
    * toward 1 below) — ref skewed_distribution, cardinality_gen.cpp:29. */
  private final class Skew(alpha: Double, rng: java.util.Random) {
    require(alpha > 0, "alpha must be positive")
    def next(): Double = math.pow(rng.nextDouble(), alpha)
  }

  /** All subproblem cardinalities for an n-relation graph with the
    * given undirected edges. Keys: singletons + every connected
    * subset. Deterministic in (seed, graph): subsets are processed in
    * (size, bitmask) order, so the RNG consumption sequence is fixed. */
  def generate(n: Int, edges: Seq[(Int, Int)], cfg: Config): Map[Set[Int], Long] = {
    require(n >= 1 && n <= 20, s"subproblem table is 2^n; n=$n out of range")
    val rng = new java.util.Random(cfg.seed ^ 0x1d9a07cfbc6e4464L)
    val skew = new Skew(cfg.alpha, rng)
    val delta = (cfg.maxCard - cfg.minCard).toDouble
    val maxSq = cfg.maxCard.toDouble * cfg.maxCard

    val adj = Array.fill(n)(0)
    edges.foreach { case (a, b) => adj(a) |= 1 << b; adj(b) |= 1 << a }
    def isConnected(mask: Int): Boolean = {
      if (mask == 0) return false
      var seen = Integer.lowestOneBit(mask)
      var frontier = seen
      while (frontier != 0) {
        var next = 0
        var f = frontier
        while (f != 0) {
          val i = Integer.numberOfTrailingZeros(f)
          next |= adj(i) & mask & ~seen
          f &= f - 1
        }
        seen |= next; frontier = next
      }
      seen == mask
    }

    val table = mutable.LinkedHashMap[Int, Double]()
    for (i <- 0 until n)
      table(1 << i) = cfg.minCard + delta * skew.next()

    if (cfg.correlated) {
      // by increasing size then bitmask: every connected proper subset
      // of S already has a cardinality when S is processed
      val connectedMasks = (1 until (1 << n))
        .filter(m => Integer.bitCount(m) >= 2 && isConnected(m))
        .sortBy(m => (Integer.bitCount(m), m))
      for (s <- connectedMasks) {
        var bound = maxSq
        // two-way splits into connected, mutually-joined halves; the
        // lowest bit of s is pinned into cand1 so each unordered
        // split is visited exactly once
        val low = Integer.lowestOneBit(s)
        val rest = s & ~low
        var t = rest
        var done = false
        while (!done) {
          val cand1 = low | t
          val cand2 = s & ~cand1
          if (cand2 != 0 && isConnected(cand1) && isConnected(cand2) &&
              (0 until n).exists(i => ((cand1 >> i) & 1) == 1 &&
                (adj(i) & cand2) != 0)) {
            val c1 = table(cand1) // connected ⇒ already rolled
            val c2 = table(cand2)
            bound = math.min(bound, c1 * c2)
          }
          if (t == 0) done = true else t = (t - 1) & rest
        }
        val effMax = math.max(math.min(bound, maxSq), cfg.minCard.toDouble)
        table(s) = cfg.minCard + (effMax - cfg.minCard) * skew.next()
      }
    } else {
      // one global target result size → per-edge selectivities
      val cardResult = cfg.minCard + delta * skew.next()
      val cartesianAll = (0 until n).map(i => table(1 << i)).product
      val combined = cardResult / cartesianAll
      val nJoins = math.max(edges.size, 1)
      val avgSel = math.pow(combined, 1.0 / nJoins)
      val sels = Array.fill(edges.size)(1.0)
      var remaining = combined
      for (j <- 1 until edges.size) {
        val (u, v) = edges(j)
        // per-edge local PRNG seeded from the endpoints (ref :298)
        val localSeed = (u.toLong * 526122883134911L) ^ v.toLong
        val localSkew = new Skew(cfg.alpha, new java.util.Random(localSeed))
        val cartesian = table(1 << u) * table(1 << v)
        val minSel = math.max(cfg.minCard / cartesian, remaining)
        sels(j) =
          if (minSel < avgSel) avgSel - (avgSel - minSel) * localSkew.next()
          else avgSel + (1.0 - avgSel) * localSkew.next()
        remaining /= sels(j)
      }
      if (edges.nonEmpty) sels(0) = remaining
      for (s <- 1 until (1 << n)
           if Integer.bitCount(s) >= 2 && isConnected(s)) {
        var c = 1.0
        for (i <- 0 until n if ((s >> i) & 1) == 1) c *= table(1 << i)
        edges.zipWithIndex.foreach { case ((u, v), j) =>
          if (((s >> u) & 1) == 1 && ((s >> v) & 1) == 1) c *= sels(j)
        }
        table(s) = math.min(math.max(c, 1.0), maxSq)
      }
    }

    table.map { case (mask, c) =>
      (0 until n).filter(i => ((mask >> i) & 1) == 1).toSet -> c.toLong
    }.toMap
  }

  /** Ref emit_cardinalities (cardinality_gen.cpp:349): entries sorted
    * by subproblem bitmask. */
  def emitJson(db: String, names: IndexedSeq[String],
      table: Map[Set[Int], Long]): String = {
    def maskOf(s: Set[Int]): Long = s.foldLeft(0L)((m, i) => m | (1L << i))
    val entries = table.toSeq.sortBy(e => maskOf(e._1)).map { case (s, c) =>
      val rels = s.toSeq.sorted.map(i => "\"" + names(i) + "\"").mkString(", ")
      s"""        { "relations": [$rels], "size": $c}"""
    }
    s"""{\n    "$db": [\n${entries.mkString(",\n")}\n    ]\n}\n"""
  }

  /** Parse the injection JSON back to name-set → size (accepts both
    * our output and hand-written files in the ref's shape). */
  def parseJson(json: String): Map[String, Map[Set[String], Long]] = {
    // a database key opens an array of objects — `"relations": [` opens
    // an array of strings and must not match
    val dbRe = """"([^"]+)"\s*:\s*\[\s*[\{\]]""".r
    val entryRe = """\{\s*"relations"\s*:\s*\[([^\]]*)\]\s*,\s*"size"\s*:\s*(\d+)\s*\}""".r
    val nameRe = """"([^"]*)"""".r
    // m.end - 1 puts back the consumed `{` of the first entry
    val dbs = dbRe.findAllMatchIn(json).map(m => (m.group(1), m.end - 1)).toSeq
    dbs.zipWithIndex.map { case ((db, from), i) =>
      val until = if (i + 1 < dbs.length) dbs(i + 1)._2 else json.length
      val body = json.substring(from, until)
      db -> entryRe.findAllMatchIn(body).map { m =>
        val rels = nameRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSet
        rels -> m.group(2).toLong
      }.toMap
    }.toMap
  }

  /** Bridge: a parsed name-keyed table + the relation names of a
    * concrete [[JoinReorder.JoinGraph]] → the index-keyed `inject`
    * map the enumerators consume. */
  def injectFor(names: IndexedSeq[String],
      table: Map[Set[String], Long]): Map[Set[Int], Double] = {
    val idx = names.zipWithIndex.toMap
    table.flatMap { case (rels, size) =>
      val ids = rels.flatMap(idx.get)
      if (ids.size == rels.size) Some(ids -> size.toDouble) else None
    }
  }
}
