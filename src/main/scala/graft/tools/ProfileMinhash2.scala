package graft.tools
import graft.Engine
import org.apache.spark.sql.functions._

object ProfileMinhash2 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("profile2")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Engine.table(spark, dir, "lineitem").count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }
    val words = split(col("text"), " ")
    val shRaw = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("ws")) - 2, lit(1))),
        i => concat_ws(" ", slice(col("ws"), i, lit(3))))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    time("shRaw count")(shRaw.count())
    val minhashSig = udaf(new graft.functions.MinHashSigAgg(64))
    val sigs = shRaw.groupBy(col("doc_id")).agg(minhashSig(col("shingle")).as("sig")).cache()
    time("sigs")(sigs.count())
    val bands = sigs.select(col("doc_id"), explode(array((0 until 16).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * 4 + 1, 4)).as("bh")) }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bh").as("bh")).cache()
    time("bands")(bands.count())
    val cands = bands.as("l").join(bands.as("r"),
      col("l.band") === col("r.band") && col("l.bh") === col("r.bh") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b")).distinct().cache()
    time("cands")(cands.count())
    time("sigs again")(sigs.count())
    spark.stop()
  }
}
