package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for single-partition window shapes.
  *
  * A `Window.orderBy(...)` with no partitionBy executes in ONE task;
  * that is only acceptable over aggregates whose size is set by a
  * value domain or a constant (see WindowAuditSpec for the audited
  * inventory). When the aggregate scales with a REAL dimension —
  * |customers|, millisecond-granular timestamps, exact cent sums —
  * the cumulative sum has to distribute: range-partition on the order
  * key so partition order IS global order, run the window locally per
  * partition (parallel), and add each partition's start offset,
  * obtained from one ≤|shuffle partitions|-row driver fetch. The same
  * classic construction as the distributed rank in
  * [[Relational.pareto]]. */
object ScaleWindows {

  /** Exact global running sum of `weightCol` in ascending `valueCol`
    * order over a distribution frame (one row per distinct value).
    * Returns the frame with a `cum` column plus the grand total —
    * bit-identical to `sum(w).over(Window.orderBy(value))` (the sums
    * are integer), with no single-partition stage.
    *
    * The input is persisted: spark_partition_id must not move between
    * the offsets fetch and the main pass (range partitioning samples
    * its boundaries; an unpinned recompute could re-draw them). */
  def cumulative(df: DataFrame, valueCol: String, weightCol: String)
      : (DataFrame, Long) = {
    val sp = df.sparkSession
    import sp.implicits._
    val sorted = df.repartitionByRange(col(valueCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val stats = sorted.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("w")).collect() // ≤ shuffle partitions rows
      .map(r => (r.getAs[Int]("__pid"), r.getAs[Long]("w")))
      .sortBy(_._1)
    val tot = stats.map(_._2).sum
    val offs = stats.map(_._2).scanLeft(0L)(_ + _).init
    val offDf = stats.map(_._1).zip(offs).toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sorted.join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum", sum(col(weightCol)).over(w) + col("__off"))
      .drop("__pid", "__off")
    (out, tot)
  }
}
