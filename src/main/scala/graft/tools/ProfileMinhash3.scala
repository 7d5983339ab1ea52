package graft.tools

/** Dev harness: stage timing + runtime join strategy of the minhash
  * plan after the de-scale-kill changes (are the candidate joins
  * AQE-converted to broadcast at small scale?). */
object ProfileMinhash3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("prof-mh")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm1")(graft.operators.DedupOps.minhashLsh(spark, dir).count())
    val df = graft.operators.DedupOps.minhashLsh(spark, dir)
    time("run2")(df.count())
    val plan = df.queryExecution.executedPlan.toString
    for (k <- Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "Exchange"))
      println(s"$k count: " + k.r.findAllIn(plan).size)
    spark.stop()
  }
}
