package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators for the dedup operators. One buffer per
  * group instead of 64 independent aggregate columns — a single
  * partial-aggregating shuffle with an Array[Long] payload (the
  * standard sketch-aggregation shape; ~10× less agg-buffer bookkeeping
  * than 64 separate min() columns).
  */
object Hashing {
  /** splitmix64 finalizer — cheap, well-mixed 64-bit permutation
    * family h_j(x) = mix(x + GOLDEN * j). JVM arithmetic wraps (this
    * is Scala code, not a Catalyst expression — ANSI overflow checks
    * don't apply). */
  final val Golden = 0x9e3779b97f4a7c15L
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature: element j = min over inputs of mix(h + j*GOLDEN). */
class MinHashSigAgg(numPerm: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)
  def reduce(b: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < numPerm) {
      val v = Hashing.mix(h + j * Hashing.Golden)
      if (v < b(j)) b(j) = v
      j += 1
    }
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerm) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** SimHash: per-bit ±1 votes over token hashes → 64-bit sign vector. */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  def zero: Array[Int] = new Array[Int](64)
  def reduce(b: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) b(j) += 1 else b(j) -= 1
      j += 1
    }
    b
  }
  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }
  def finish(b: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < 64) { if (b(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Knuth iterative mean (TAOCP Vol 2, 4.2.2): m += (x - m)/n — the
  * reference's AVG semantics (ref src/backend/Interpreter.cpp:1241,
  * WasmOperator.cpp running-avg path). Parallel-safe via the standard
  * pairwise merge m = m1 + (m2 - m1)·n2/(n1+n2); on a single ordered
  * partition it reproduces the reference's sequential result
  * bit-for-bit (used by the golden-corpus parity mode). */
object RunningAvgAgg extends Aggregator[java.lang.Double, Array[Double], java.lang.Double] {
  // buffer = (count, mean)
  def zero: Array[Double] = Array(0.0, 0.0)
  def reduce(b: Array[Double], x: java.lang.Double): Array[Double] = {
    if (x != null) { b(0) += 1; b(1) += (x - b(1)) / b(0) }
    b
  }
  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a(0) == 0) b
    else if (b(0) == 0) a
    else {
      val n = a(0) + b(0)
      Array(n, a(1) + (b(1) - a(1)) * b(0) / n)
    }
  }
  def finish(b: Array[Double]): java.lang.Double =
    if (b(0) == 0) null else b(1)
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

/** Misra-Gries frequent-items summary (Misra & Gries, Sci. Comp.
  * Prog. 1982; mergeable form after Agarwal et al., PODS'12): at most
  * k counters. When a new item arrives at a full summary, every
  * counter drops by the current minimum (the batched form of the
  * classic decrement — at least one counter reaches zero and the new
  * item, at 1 − min ≤ 0, is discarded with them). Merge sums
  * counters pointwise, then subtracts the (k+1)-th largest count so
  * at most k survive. Mass argument: every decrement of m removes
  * ≥ k·m counted mass (reduce) or ≥ (k+1)·m (merge cut), so the
  * total undercount of ANY item is ≤ n/k over n inputs — regardless
  * of partitioning or merge order. Hence every item with true count
  * > n/k is guaranteed present, which is what lets a two-pass heavy
  * hitter built on this sketch return an EXACT, deterministic answer
  * (see TextOps.heavyHitters). Buffer is ≤ k entries — constant
  * memory per partial aggregate, vs. the full distinct-token
  * distribution an exact histogram shuffles. */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        val m = b.valuesIterator.min
        // new item's would-be count 1 − m ≤ 0: dropped with the zeros
        b.collect { case (t, c) if c > m => (t, c - m) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s =
      if (a.isEmpty) b else if (b.isEmpty) a
      else b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
    if (s.size <= k) s
    else {
      val vs = s.valuesIterator.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - (k + 1)) // (k+1)-th largest
      s.collect { case (t, c) if c > cut => (t, c - cut) }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b
  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Per-source top-k NEIGHBOR selection with exact-duplicate collapse —
  * the reduce side of the kNN-graph build. Buffer layout: 2k longs,
  * slot 2i = neighbor id, slot 2i+1 = raw IEEE bits of its cosine,
  * entries kept sorted by (cosine DESC, id ASC), empty slots id =
  * Long.MinValue. A candidate pair colliding in several LSH
  * tables/probes arrives several times with a BIT-IDENTICAL cosine
  * (the scoring fold is direction-blind and deterministic), so the
  * insert scan treats an exact (id, bits) match as a no-op — the
  * aggregate performs the dropDuplicates and the per-source top-k in
  * ONE pass. Why this exists: the window form shuffled the full
  * candidate-pair stream TWICE (581M rows through a (lo,hi) distinct
  * that removed only 31 %, then 887M exploded rows through the
  * per-src rank exchange — measured 60 s + 100 s of the 148 s 100×
  * wall); here the map side reduces every partition to ≤ k entries
  * per source, so the one exchange carries partial k-entry buffers —
  * millions of rows, not hundreds of millions. Order-free by
  * construction: top-k over a total order with exact-duplicate
  * dedup is associative and commutative. */
class TopKNbrAgg(k: Int)
    extends Aggregator[(Long, Double), Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.fill(2 * k)(Long.MinValue)

  /** Insert (id, cos); returns the (mutated) buffer.
    *
    * Duplicate detection keys on the id ALONE, then ASSERTS the bits
    * match: the determinism contract (the scoring fold is direction-
    * blind and deterministic, enforced far away in the knnGraph join)
    * guarantees a repeated neighbor id always carries the identical
    * cosine. Keying the dedup on (id, bits) — the round-10 form —
    * made a violated contract SILENT: the same id would occupy two
    * top-k slots and corrupt the emitted graph. Now it throws. */
  private def insert(b: Array[Long], id: Long, bits: Long): Array[Long] = {
    val cos = java.lang.Double.longBitsToDouble(bits)
    // pre-scan the occupied prefix for this id: a duplicate anywhere
    // in the buffer is a no-op (equal bits) or a loud contract failure
    // (unequal bits) — never a second slot
    var d = 0
    while (d < k && b(2 * d) != Long.MinValue) {
      if (b(2 * d) == id) {
        if (b(2 * d + 1) != bits)
          throw new IllegalStateException(
            s"TopKNbrAgg determinism contract violated: neighbor $id " +
              s"scored ${java.lang.Double.longBitsToDouble(b(2 * d + 1))} " +
              s"and $cos in the same (src,dst) group")
        return b
      }
      d += 1
    }
    var i = 0
    while (i < k) {
      val sid = b(2 * i)
      if (sid == Long.MinValue) { // first empty slot: append here
        b(2 * i) = id; b(2 * i + 1) = bits
        return b
      }
      val scos = java.lang.Double.longBitsToDouble(b(2 * i + 1))
      if (cos > scos || (cos == scos && id < sid)) {
        // shift [i, k-2] down one slot, insert at i
        var j = k - 1
        while (j > i) {
          b(2 * j) = b(2 * (j - 1)); b(2 * j + 1) = b(2 * (j - 1) + 1)
          j -= 1
        }
        b(2 * i) = id; b(2 * i + 1) = bits
        return b
      }
      i += 1
    }
    b // sorts after the kth entry: rejected
  }

  def reduce(b: Array[Long], in: (Long, Double)): Array[Long] =
    insert(b, in._1, java.lang.Double.doubleToRawLongBits(in._2))

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k && b(2 * i) != Long.MinValue) {
      insert(a, b(2 * i), b(2 * i + 1))
      i += 1
    }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
