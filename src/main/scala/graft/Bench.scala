package graft

/** Benchmark main: headline queries (TPC-H-shaped + operator
  * microbenches, mirroring the reference's benchmark/tpc-h and
  * benchmark/operators suites) on SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE JSON line {"metric":...,"queries":{...}}. Each query is
  * fully materialized via the noop sink (count() would let Catalyst
  * prune the aggregate expressions away). One warm-up pass on q6
  * amortizes parquet footer reads/JIT before timing.
  *
  * Runs in the PRODUCTION session (`Engine.session`): the join-reorder
  * extension, AQE and the object-hash-agg threshold are part of what is
  * being measured.
  *
  * Each query is timed 3× in one JVM; "queries" reports the best run
  * (the first pays whole-stage-codegen compilation, amortized on a
  * long-lived cluster) and "runs" reports all three so a reviewer can
  * separate run-to-run variance from real regressions.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
    "q12_priority_count", "q14_promo_revenue",
    "join_pk_fk", "join_n2m", "join_5way_star",
    "group_by_single", "group_by_multi", "group_by_salted_skew",
    "agg_global", "order_by_topk",
    "dedup_exact", "dedup_minhash_lsh", "sim_knn_bruteforce",
    "text_quality_score", "events_sessionize", "events_asof_join",
    "dialect_q1")

  val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q6_forecast_revenue") // warm-up: JIT + parquet footers
    val results = headline.map { n =>
      val times = (1 to Reps).map(_ => runOnce(n)).filter(_ >= 0)
      n -> (if (times.isEmpty) Seq(-1.0) else times)
    }
    def fmt(v: Double) = f"$v%.4f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v.min) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
