package graft

import graft.operators.{EventOps, SimilarityOps, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-8 operators:
  * each is checked against an INDEPENDENT formulation (driver-side
  * recompute or a naive single-window plan) rather than just its
  * DuckDB oracle, so a Spark-side plan change that breaks semantics
  * fails here before the verify round. */
class ProfileCalibrationSpec extends AnyFunSuite {
  import TestSession._

  test("user streaks match a driver-side gaps-and-islands recompute") {
    val got = EventOps.userStreaks(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val days = Engine.table(spark, sf, "events")
      .selectExpr("user_id", "unix_millis(ts) div 86400000 as day")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(days.keySet == got.keySet, "user set drifted")
    for ((u, ds) <- days) {
      // split the sorted distinct days into maximal consecutive runs
      val runs = ds.tail.foldLeft(Vector(Vector(ds.head))) { (acc, d) =>
        if (d == acc.last.last + 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val want = (ds.size.toLong, runs.map(_.size).max.toLong, runs.size.toLong)
      assert(got(u) == want, s"user $u: got ${got(u)}, want $want")
    }
  }

  test("distribution-aggregate calibration equals the naive percent_rank window") {
    val got = TextOps.qualityCalibrate(spark, sf)
    // the straightforward plan the scale-shaped op must reproduce:
    // PERCENT_RANK over every raw document within its source
    val naive = TextOps.qualityScore(spark, sf)
      .join(Engine.table(spark, sf, "documents").select("doc_id", "source"),
        "doc_id")
      .select(col("doc_id"), col("source"), col("stop_ratio").as("score"),
        percent_rank().over(
          Window.partitionBy(col("source")).orderBy(col("stop_ratio")))
          .as("calibrated"))
    val g = got.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
    val n = naive.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(g == n, {
      val bad = n.collect { case (k, v) if g.get(k) != Some(v) =>
        s"$k: got ${g.get(k)}, want $v" }
      s"calibration divergence (${bad.size}): ${bad.take(3).mkString("; ")}"
    })
  }

  test("covariance diagonal matches the profile variance; one cell recomputed exactly") {
    val cov = SimilarityOps.covariance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val d = SimilarityOps.Dim
    assert(cov.size == d * (d + 1) / 2, "upper triangle size")
    val stds = SimilarityOps.dimProfile(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for (i <- 0 until d) {
      val (_, c) = cov((i.toLong, i.toLong))
      val v = stds(i.toLong) * stds(i.toLong)
      assert(math.abs(c - v) <= 1e-9 * math.max(math.abs(v), 1e-12),
        s"diag $i: cov=$c var=$v")
    }
    // exact driver recompute of cell (0, 1) through the same
    // decimal-quantized product sums
    def q6(v: Double): Long = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).underlying
      .unscaledValue.longValueExact
    val vs = Engine.table(spark, sf, "embeddings")
      .selectExpr("cast(embedding[0] as double) as x0",
        "cast(embedding[1] as double) as x1")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = vs.length.toLong
    val sxy = vs.map { case (a, b) => q6(a * b) }.sum / 1e6
    val sx0 = vs.map(v => q6(v._1)).sum / 1e6
    val sx1 = vs.map(v => q6(v._2)).sum / 1e6
    assert(cov((0L, 1L))._2 == (n * sxy - sx0 * sx1) / (n * n))
  }

  test("nearest as-of join picks the closer purchase, ties to the earlier one") {
    val got = EventOps.asofNearest(spark, sf).collect().map { r =>
      r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    val ev = Engine.table(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .selectExpr("user_id", "unix_millis(ts) as ms", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    var checked = 0
    for ((_, rows) <- byUser; (_, ms, t, id) <- rows if t == "click") {
      val ps = rows.filter(_._3 == "purchase").map(p => (p._2, p._4))
      val prev = ps.filter(_._1 <= ms).sortBy(identity).lastOption
      val next = ps.filter(_._1 > ms).sortBy(identity).headOption
      val want = (prev, next) match {
        case (None, None) => (None, None)
        case (Some((pm, pi)), nxt)
            if nxt.isEmpty || ms - pm <= nxt.get._1 - ms =>
          (Some(pi), Some(pm - ms))
        case (_, Some((nm, ni))) => (Some(ni), Some(nm - ms))
        case other => fail(s"unreachable: $other")
      }
      assert(got(id) == want, s"click $id: got ${got(id)}, want $want")
      checked += 1
    }
    assert(checked > 0)
  }

  test("dimension profile: invariants + exact recompute of one dimension") {
    val rows = SimilarityOps.dimProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == SimilarityOps.Dim)
    val nVec = Engine.table(spark, sf, "embeddings").count()
    for ((dim, n, mn, mx, mean, std) <- rows) {
      assert(n == nVec, s"dim $dim: n=$n != $nVec")
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"dim $dim: mean outside [min,max]")
      assert(std >= 0.0, s"dim $dim: negative std")
    }
    // exact recompute of dim 0 through the same decimal-quantized sums
    val xs = Engine.table(spark, sf, "embeddings")
      .selectExpr("cast(embedding[0] as double) as x").collect()
      .map(_.getDouble(0))
    def q6(v: Double): Long = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).underlying
      .unscaledValue.longValueExact
    val sx = xs.map(q6).sum / 1e6
    val sxx = xs.map(x => q6(x * x)).sum / 1e6
    val n = xs.length.toLong
    val (_, _, mn0, mx0, mean0, std0) = rows.minBy(_._1)
    assert(mn0 == xs.min && mx0 == xs.max)
    assert(mean0 == sx / n)
    assert(std0 == math.sqrt(n * sxx - sx * sx) / n)
  }
}
