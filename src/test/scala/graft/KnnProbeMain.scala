package graft

// Temporary measurement probe (not shipped): stage split of the
// sim_knn_graph build, replicating SimilarityOps.knnGraph's internals
// with timing points. Run via Test/runMain.
object KnnProbeMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf100")
    val sp = Engine.session("knn-probe")
    import graft.operators.SimilarityOps._
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[probe] $tag%-22s ${(System.nanoTime - t0) / 1e9}%8.1f s   rows $n%,d")
      sp.sharedState.cacheManager.clearCache()
    }
    val vv = graft.Engine.table(sp, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.functions.dot_product(col("v"), col("v"))))
    val n = vv.count()
    val (tables, bits) = lshConfig(n)
    println(s"[probe] n=$n tables=$tables bits=$bits")
    val b = buckets(vv, tables, bits)
    t("buckets")(b.count())
    val flips = math.min(bits, KnnProbeFlips)
    val pairsPerTask = 5e6
    val parts = math.max(sp.sparkContext.defaultParallelism,
      math.ceil(n.toDouble * tables * (flips + 1) * 32 / pairsPerTask).toInt)
    println(s"[probe] flips=$flips parts=$parts")
    val probeSide = b
      .select(col("vec_id").as("src"), col("tbl").as("qtbl"),
        col("sig").as("psig"), col("ord"),
        col("v").as("va"), col("nrm").as("na"))
      .repartition(parts, col("src"))
      .select(col("src"), col("qtbl"),
        explode(array(col("psig") +:
          (0 until flips).map(q => expr(
            s"psig ^ shiftleft(1L, cast((ord >> ${q * 4}) & 15 as int))")): _*))
          .as("qsig"),
        col("va"), col("na"))
    t("probeSide")(probeSide.count())
    val bw = Window.partitionBy(col("tbl"), col("sig"))
      .orderBy(xxhash64(col("dst"), col("tbl"), col("sig")), col("dst"))
    val capped = b.select(col("vec_id").as("dst"), col("tbl"), col("sig"),
        col("v").as("vb"), col("nrm").as("nb"))
      .withColumn("brn", row_number().over(bw))
      .filter(col("brn") <= KnnBucketCap)
      .drop("brn")
    t("capped")(capped.count())
    val dot = (a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =>
      graft.functions.functions.dot_product(a, c)
    val scored = probeSide
      .join(capped,
        col("tbl") === col("qtbl") && col("sig") === col("qsig") &&
          col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
    t("join+score (pre-dedup)")(scored.count())
    val dd = scored.dropDuplicates("lo", "hi")
    t("...+dropDuplicates")(dd.count())
    val cand = dd
      .select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst")),
        struct(col("hi").as("src"), col("lo").as("dst")))).as("p"),
        col("cosine"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"), col("cosine"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst").asc)
    val out = cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnGraphK)
    t("...+topk (full)")(out.count())
    sp.stop()
  }
}
