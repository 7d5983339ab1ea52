package graft.tools
import graft.Engine
import graft.operators.DedupOps

/** Dev tool: end-to-end timing of the minhash query (2 runs). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("profile")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props.get("graft.objHashThreshold").foreach(v =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    Engine.table(spark, dir, "lineitem").count() // session warmup
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("minhash run1")(DedupOps.minhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("minhash run2")(DedupOps.minhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
