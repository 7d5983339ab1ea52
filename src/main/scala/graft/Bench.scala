package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries (TPC-H-shaped + operator
  * microbenches, mirroring the reference's benchmark/tpc-h and
  * benchmark/operators suites) on SPARK_GRAFT_SF_DIR.
  *
  * Prints ONE JSON line {"metric":...,"queries":{...}}. Each query is
  * fully materialized via the noop sink (count() would let Catalyst
  * prune the aggregate expressions away). One warm-up pass on q6
  * amortizes parquet footer reads/JIT before timing.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    // best-of-2: the first run pays whole-stage-codegen compilation,
    // which on a long-lived cluster is amortized across queries
    def run(name: String): Double = {
      val a = runOnce(name)
      if (a < 0) return a
      val b = runOnce(name)
      if (b < 0) a else math.min(a, b)
    }

    runOnce("q6_forecast_revenue") // warm-up: JIT + parquet footers
    val results = headline.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
