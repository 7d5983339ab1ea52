package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-op cache()s are dead after the dump — don't let 80+
      // queries' worth of them pile up in one session
      spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // quantitative gates for the no-oracle (approximate) ops: score
    // each against its exact twin and surface the numbers next to the
    // correctness dump so "no_oracle" rows carry an auditable metric
    try {
      val gates = graft.tools.QualityGates.compute(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/quality.json"),
        graft.tools.QualityGates.toJson(gates))
      gates.foreach { g =>
        System.err.println(f"[quality] ${g.query}%-22s ${g.metric}%-26s " +
          f"${g.value}%.4f >= ${g.threshold}%.2f ${if (g.pass) "PASS" else "FAIL"}")
      }
      spark.sharedState.cacheManager.clearCache()
    } catch { case e: Throwable =>
      System.err.println(s"[verify] quality gates failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
