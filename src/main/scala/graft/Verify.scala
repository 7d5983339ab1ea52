package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev mode: extra args name specific queries to dump (skips the
    // quality gates); the driver always calls with exactly two args
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
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
    if (only.isEmpty) try {
      val gates = graft.tools.QualityGates.compute(spark, sfDir)
      val gatesJson = graft.tools.QualityGates.toJson(gates)
      Files.writeString(Paths.get(s"$outDir/quality.json"), gatesJson)
      // the no_oracle rows' evidence must survive the round: mirror the
      // gate values into the repo root (committed as QUALITY_r{N}.json)
      // instead of living only in the driver's scratch outDir
      try Files.writeString(Paths.get("QUALITY.json"), gatesJson)
      catch { case e: Throwable =>
        System.err.println(s"[verify] QUALITY.json mirror failed: ${e.getMessage}")
      }
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
