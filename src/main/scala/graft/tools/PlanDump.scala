package graft.tools

import graft.{Engine, SparkEntry}

/** Dump `.explain("formatted")` for named queries — the before/after
  * plan evidence an optimization round commits under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>
  * writes `<outDir>/<query>_<suffix>.txt` per query. The plan is the
  * pre-execution formatted plan (AQE initial) — join strategies,
  * Exchange placement, PushedFilters and ReadSchema are all visible
  * there; for final adaptive plans use [[SoloProfile]].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq.filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-plandump")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        System.err.println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
