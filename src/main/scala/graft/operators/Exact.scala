package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent exact summation of double expressions whose true
  * values have ≤ 6 decimal digits (all monetary/quantity columns in
  * the TPC-H-ish testdata: products of 2-decimal inputs).
  *
  * Two modes, identical results where both are defined:
  *  - `long` (default): Σ rint(x·10⁶) as 64-bit integers, ÷10⁶ at the
  *    end. Integer addition is exact and associative → bit-identical
  *    doubles on any partitioning, and ~5× faster than decimal
  *    aggregation (plain long sums in Tungsten). Bound: |Σx| < 9.2e12
  *    per group — beyond that ANSI mode fails loudly with
  *    ARITHMETIC_OVERFLOW rather than returning a wrong answer.
  *  - `decimal` (GRAFT_EXACT_SUM=decimal): SUM(CAST(x AS
  *    DECIMAL(18,6))) — slower, no practical bound; the scale-up path.
  *
  * rint (round-half-even to nearest integer) is safe because the true
  * values are exactly representable at scale 6 — never at a rounding
  * midpoint — so any nearest-rounding recovers the exact scaled
  * integer on every engine (this is also why results match a DuckDB
  * oracle that sums DECIMAL(18,6) casts).
  */
object Exact {
  private val D = DecimalType(18, 6)
  private val mode = sys.env.getOrElse("GRAFT_EXACT_SUM", "long")

  /** Exact, order-independent sum of a double expression → double. */
  def dsum(c: Column): Column =
    if (mode == "decimal") sum(c.cast(D)).cast("double")
    else sum(rint(c * 1e6).cast("long")) / 1e6

  /** Windowed form of [[dsum]] (an aggregate must take `.over` BEFORE
    * the rescaling division, so dsum itself can't be windowed). */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    if (mode == "decimal") sum(c.cast(D)).over(w).cast("double")
    else sum(rint(c * 1e6).cast("long")).over(w) / 1e6

  /** Matching DuckDB oracle fragment (always the decimal form — both
    * modes produce exactly its values). */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Scalar twin of [[dsum]]'s per-value quantization — the scaled
    * long one value contributes to a sum, IN THE ACTIVE MODE. Imperative
    * re-implementations of a dsum (the streaming state twins) must go
    * through this, not a hardcoded rint: `long` mode rounds HALF_EVEN
    * via rint, `decimal` mode rounds HALF_UP exactly as Spark's
    * double→DECIMAL(18,6) cast does (BigDecimal.valueOf = the double's
    * shortest decimal form, matching Cast's Decimal(BigDecimal(d))),
    * and a value on a .0000005 midpoint differs between the two. */
  def q6(v: Double): Long =
    if (mode == "decimal")
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    else math.rint(v * 1e6).toLong

  /** Unscaled DECIMAL(18,6) quantization of one double — the exact
    * long that Spark's `CAST(x AS DECIMAL(18,6))` contributes to a
    * decimal sum — MODE-INDEPENDENT (always the decimal-cast
    * semantics, for imperative twins of ops that hardcode the decimal
    * form on both engines, e.g. the covariance sufficient-stats
    * pass). Fast path: v·10⁶ in IEEE is within |s|·2⁻⁵² + ulp/2 of
    * the true shortest-decimal value, so away from a .5 rounding
    * midpoint plain floor arithmetic produces the identical integer
    * (HALF_UP and nearest agree off-midpoint, for either sign);
    * within the error band of a midpoint — or beyond the 10¹⁵
    * magnitude guard where the representation error can cross a
    * midpoint — fall back to the authoritative
    * BigDecimal.valueOf path (valueOf = shortest decimal form,
    * exactly Cast's Decimal(BigDecimal(d))). ~20× cheaper than
    * Double.toString-ing every product in a Dim²-per-row loop. */
  def q6dec(v: Double): Long = {
    val s = v * 1e6
    // fast-path magnitude guard 1e15 (not 2^52): with the band capped
    // at 0.499 the fast path must know the true decimal value lies on
    // the same side of the midpoint, and the combined representation
    // error (10⁶·ulp(v)/2 from the scale multiply + ulp(s)/2) reaches
    // ~0.73 near 4e15 — above the 0.499 margin; at 1e15 it is ≤ ~0.19
    if (math.abs(s) < 1.0e15) {
      val f = math.floor(s)
      val frac = s - f
      // tolerance ≫ the 3.4e-16 relative float error yet ≪ 0.5 for
      // every magnitude this engine sums (products of embedding
      // coordinates: |s| ≤ ~1e9); capped at 0.499 so the band can
      // never swallow the whole fraction — beyond |s| ≈ 5e11 the
      // uncapped band would exceed 0.5 and silently route EVERY value
      // down the BigDecimal slow path (still correct, just 20× slower)
      if (math.abs(frac - 0.5) >
          math.min(0.499, 1e-9 + math.abs(s) * 1e-12))
        return if (frac > 0.5) f.toLong + 1L else f.toLong
    }
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValue()
  }

  /** Driver-side scalar fold twin of [[dsum]], IN THE ACTIVE MODE —
    * for exact-recompute quality gates that must reproduce a
    * distributed dsum bit-for-bit: `long` mode ends with the same
    * long→double divide-by-10⁶ Spark's plan runs; `decimal` mode ends
    * with the same decimal→double cast. */
  def dsumScalar(vs: Iterable[Double]): Double =
    if (mode == "decimal")
      q6decToDouble(vs.foldLeft(0L)((a, v) => a + q6dec(v)))
    else vs.foldLeft(0L)((a, v) => a + math.rint(v * 1e6).toLong) / 1e6

  /** Inverse of [[q6dec]]'s scaling for an accumulated unscaled sum:
    * exactly Spark's DECIMAL(…,6)→DOUBLE cast (BigDecimal
    * .doubleValue — correctly rounded even past 2⁵³, where a plain
    * `u / 1e6` double division is not). */
  def q6decToDouble(u: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 6).doubleValue()
}
