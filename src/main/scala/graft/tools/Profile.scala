package graft.tools

import graft.Engine

/** Dev harness: time any registered `SparkEntry.queries` entry and dump
  * its runtime join strategy. Replaces the one-off ProfileMinhash*/
/* harnesses flagged by the round-3 review.
 *
 * Usage:  runMain graft.tools.Profile <query>[,<query>…] [sfDir] [runs]
 * e.g.    runMain graft.tools.Profile dedup_minhash_lsh /root/testdata/sf0.1 3
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dedup_minhash_lsh").split(',').toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Engine.session("profile")
    // session warmup; ScaleBench scratch dirs carry only the three
    // pipeline tables, so fall back to documents there
    val warmTable =
      if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/lineitem.parquet"))) "lineitem"
      else "documents"
    Engine.table(spark, dir, warmTable).count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (name <- names) {
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      // PROFILE_CLEAR=1 drops caches between runs — measures the
      // fresh-pipeline cost ScaleBench's clear-per-rep protocol sees,
      // instead of warm-cache steady state (Bench's within-query view)
      val clearEach = sys.env.get("PROFILE_CLEAR").contains("1")
      for (i <- 1 to runs) {
        time(s"$name run$i")(
          q(spark, dir).write.format("noop").mode("overwrite").save())
        if (clearEach) spark.sharedState.cacheManager.clearCache()
      }
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      for (k <- Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "ShuffleExchange",
                    "BroadcastExchange", "InMemoryTableScan"))
        println(s"[profile] $name $k count: " + k.r.findAllIn(plan).size)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
