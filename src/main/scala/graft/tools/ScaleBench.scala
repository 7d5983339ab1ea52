package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof benchmark: derive a 10× (sf1-equivalent) corpus from
  * sf0.1 in a scratch directory and measure the heavy pipeline
  * operators at both scales — the empirical backing for the "would
  * this hold at 100 TB" design claims, which were previously
  * extrapolated from sf0.1 alone. Near-linear median growth (≤ ~12×
  * at 10× rows on a fixed 32-core box) is the pass shape; anything
  * superlinear is called out in README.
  *
  * The 10× corpus is NOT ten identical copies: identical copies would
  * give every document/vector 9 exact duplicates, growing near-dup
  * OUTPUT quadratically and making any dedup op look superlinear for
  * workload reasons rather than plan reasons. Each copy is
  * key-shifted and content-perturbed so per-copy duplicate structure
  * is preserved while cross-copy similarity stays background-level:
  *  - documents: doc_id shifted; text Caesar-shifted by the copy
  *    index (length/token structure preserved, shingles disjoint)
  *  - embeddings: vec_id shifted; embedding rotated by the copy index
  *    (norms preserved, cross-copy cosine at random-background level)
  *  - events: event_id and user_id shifted (10× users, same per-user
  *    timeline density; raw nanos `ts` kept as int64)
  *
  * Usage: `runMain graft.tools.ScaleBench [baseDir] [scratchDir] [out]`
  * Defaults: /root/testdata/sf0.1, /tmp/graft_scale/sf1,
  * SCALEBENCH.json. */
object ScaleBench {

  val Copies = 10
  val Ops: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_containment", "dedup_cluster",
    "pipeline_pack_sequences", "events_sessionize",
    "sim_neardup_lsh", "sim_ann_ivf", "dedup_semantic")

  private def caesar(c: Column, shift: Int): Column = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String) = s.drop(shift % 26) + s.take(shift % 26)
    translate(c, lower + upper, rot(lower) + rot(upper))
  }

  /** Build the 10× corpus (idempotent: skipped if the directory
    * already holds all three tables). */
  def derive(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    val done = Seq("documents", "embeddings", "events").forall(t =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$outDir/$t.parquet")))
    if (done) return
    new java.io.File(outDir).mkdirs()
    val Off = 10_000_000L

    def tenfold(name: String, copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = name match {
        // raw read keeps events.ts as int64 nanos; the derived file is
        // plain INT64, which Engine.table converts identically
        case "events" => spark.read.parquet(s"$baseDir/events.parquet")
        case _ => spark.read.parquet(s"$baseDir/$name.parquet")
      }
      (0 until Copies).map(i => copy(base, i))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

    tenfold("documents", (df, i) => df.select(
      (col("doc_id") + i * Off).as("doc_id"),
      caesar(col("text"), i).as("text"),
      col("lang"), col("source"), col("n_chars")))
    tenfold("embeddings", (df, i) => df.select(
      (col("vec_id") + i * Off).as("vec_id"),
      (if (i == 0) col("embedding")
       else concat(slice(col("embedding"), i + 1, 64 - i),
         slice(col("embedding"), 1, i))).as("embedding"),
      col("label")))
    tenfold("events", (df, i) => df.select(
      (col("event_id") + i * Off).as("event_id"),
      col("ts"),
      (col("user_id") + i * Off).as("user_id"),
      col("event_type"), col("value"), col("props")))
  }

  private def runOnce(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime - t0) / 1e9
    spark.sharedState.cacheManager.clearCache()
    s
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val outPath = args.lift(2).getOrElse("SCALEBENCH.json")
    val spark = Engine.session("graft-scalebench")
    derive(spark, baseDir, scratch)

    val rows = Seq("documents", "embeddings", "events").map { t =>
      t -> (Engine.table(spark, baseDir, t).count(),
        Engine.table(spark, scratch, t).count())
    }
    rows.foreach { case (t, (b, x)) =>
      System.err.println(s"[scalebench] $t: $b rows -> $x rows") }

    val results = Ops.map { op =>
      runOnce(spark, op, baseDir) // warm-up at base
      val base = median((1 to 3).map(_ => runOnce(spark, op, baseDir)))
      runOnce(spark, op, scratch) // warm-up at 10x
      val x10 = median((1 to 3).map(_ => runOnce(spark, op, scratch)))
      val ratio = x10 / base
      System.err.println(
        f"[scalebench] $op%-26s base $base%7.2f s   10x $x10%7.2f s   ratio $ratio%5.2f")
      (op, base, x10, ratio)
    }

    def fmt(d: Double) = f"$d%.4f"
    val json = s"""{"copies":$Copies,"base":"$baseDir","rows":{""" +
      rows.map { case (t, (b, x)) => s""""$t":[$b,$x]""" }.mkString(",") +
      s"""},"ops":{""" +
      results.map { case (op, b, x, r) =>
        s""""$op":{"base_s":${fmt(b)},"x10_s":${fmt(x)},"ratio":${fmt(r)}}"""
      }.mkString(",") + "}}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
