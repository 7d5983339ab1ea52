package graft.tools
import graft.Engine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool: decimal-exact vs plain-double q1 aggregation cost. */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("profq1")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Engine.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp")).cache()
    li.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val D = DecimalType(18, 6)
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(D)).cast("double")
    def run(s: (org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        s(col("l_quantity")).as("a"), s(col("l_extendedprice")).as("b"),
        s(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
        s(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("d"))
        .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) time(s"decimal sums $i")(run(dsum))
    for (i <- 1 to 2) time(s"double sums $i")(run(c => sum(c)))
    for (i <- 1 to 2) time(s"scaled-long sums $i")(run(c =>
      (sum((c * 1e6).cast("long")) / 1e6).cast("double")))
    spark.stop()
  }
}
