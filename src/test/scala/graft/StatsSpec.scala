package graft

import graft.Engine
import graft.operators.StatsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-statistics operators: the exact discrete quantiles against
  * a driver-side recompute, and the sketch ops against their exact
  * twins (the same accuracies QualityGates surfaces per round). */
class StatsSpec extends AnyFunSuite {
  import TestSession._

  test("exact length quantiles match a driver-side sorted recompute") {
    val got = StatsOps.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))))
      .toMap
    val raw = Engine.table(spark, sf, "documents")
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == raw.keySet)
    for ((lang, vals) <- raw) {
      val (n, qs) = got(lang)
      assert(n == vals.length, s"$lang n_docs")
      val want = Seq(0.25, 0.50, 0.75, 0.90)
        .map(p => vals(math.ceil(p * vals.length).toInt - 1))
      assert(qs == want, s"$lang quantiles: got $qs want $want")
      assert(qs == qs.sorted, s"$lang quantiles not monotone")
    }
  }

  test("HLL distinct estimate within max(5%, ±3) of exact per source") {
    val hll = StatsOps.approxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Engine.table(spark, sf, "documents")
      .groupBy(col("source")).agg(countDistinct(col("text")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hll.keySet == exact.keySet)
    for ((s, ex) <- exact) {
      // tiny groups get an absolute floor: at |distinct| ≈ 25 a ±2
      // wobble is 8% relative yet well inside HLL's expected band
      val tol = math.max(0.05 * ex, 3.0)
      val err = math.abs(hll(s) - ex).toDouble
      assert(err <= tol, s"source $s: HLL ${hll(s)} vs exact $ex (err $err)")
    }
  }

  test("sketch quantiles within 10% of the exact discrete quantiles") {
    val exact = StatsOps.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val approx = StatsOps.approxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, ex) <- exact; (e, a) <- ex.zip(approx(lang))) {
      val dev = math.abs(a - e).toDouble / math.max(e, 1L)
      assert(dev <= 0.10, s"$lang: approx $a vs exact $e (dev $dev)")
    }
  }

  test("KS drift matches a driver-side ECDF recompute exactly") {
    val got = StatsOps.ksDrift(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = Engine.table(spark, sf, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tot = rows.length.toLong
    val bySource = rows.groupBy(_._1)
    val values = rows.map(_._2).distinct.sorted
    assert(got.keySet == bySource.keySet)
    for ((s, rs) <- bySource) {
      val n = rs.length.toLong
      val cntS = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cntAll = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var cs = 0L; var ca = 0L; var maxNum = 0L
      for (v <- values) {
        cs += cntS.getOrElse(v, 0L)
        ca += cntAll(v)
        val num = math.abs(cs * (tot - n) - (ca - cs) * n)
        if (num > maxNum) maxNum = num
      }
      val ks = maxNum.toDouble / (1.0 * n * (tot - n))
      assert(got(s) == ((n, ks)), s"$s: got ${got(s)}, want ($n, $ks)")
    }
  }

  test("value-hour correlation matches a driver-side naive Pearson") {
    val got = StatsOps.valueCorr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val raw = Engine.table(spark, sf, "events")
      .selectExpr("event_type", "value", "(unix_millis(ts) div 3600000) % 24 AS h")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == raw.keySet)
    for ((et, rows) <- raw) {
      val n = rows.length.toDouble
      val xs = rows.map(_._2); val ys = rows.map(_._3.toDouble)
      val mx = xs.sum / n; val my = ys.sum / n
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
      val want = num / den
      val (gn, gc) = got(et)
      assert(gn == rows.length, s"$et n")
      assert(math.abs(gc - want) < 1e-9, s"$et corr $gc vs $want")
    }
  }

  test("zipf slope is negative, head-sized, and reproducible") {
    val out = StatsOps.zipfSlope(spark, sf).collect()
    val srcN = Engine.table(spark, sf, "documents")
      .select("source").distinct().count()
    assert(out.length == srcN, "one fit per source")
    out.foreach { r =>
      val (src, n, slope) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(n > 1 && n <= StatsOps.ZipfTopR, s"$src n_ranks $n")
      // token frequencies are non-increasing in rank, so the LS slope
      // over the log-log head is necessarily <= 0; natural-ish text
      // sits well below (the -1 Zipf regime)
      assert(slope <= 0.0, s"$src slope $slope not <= 0")
      assert(java.lang.Double.isFinite(r.getDouble(3)), s"$src intercept")
    }
    val again = StatsOps.zipfSlope(spark, sf).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "zipf fit not deterministic across runs")
  }
}
