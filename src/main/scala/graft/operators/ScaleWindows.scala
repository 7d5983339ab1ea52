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

  /** Grouped variant of [[cumulative]]: one exact running sum of
    * `weightCol` in ascending `valueCol` order PER `keyCol` group,
    * from a single range-partition + offsets fetch over the whole
    * frame (range order on (key, value) makes partition order global
    * order within every group). Adds `cum` and the per-group grand
    * total `tot` — the shape [[MiningOps.rfm]]'s three quintile
    * passes collapse into: 3× (persist + collect + window) becomes
    * 1× with a 3-way-unpivoted input. Offsets/totals stay a
    * ≤ |partitions|·|keys| driver fetch. */
  def cumulativeBy(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val sorted = df.repartitionByRange(col(keyCol).asc, col(valueCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val stats = sorted.groupBy(col("__pid"), col(keyCol))
      .agg(sum(col(weightCol)).as("w")).collect()
      .map(r => (r.getAs[Int]("__pid"), r.getAs[String](keyCol),
        r.getAs[Long]("w")))
    val offRows = stats.groupBy(_._2).toSeq.flatMap { case (key, rows) =>
      val sortedRows = rows.sortBy(_._1)
      val tot = sortedRows.map(_._3).sum
      val offs = sortedRows.map(_._3).scanLeft(0L)(_ + _).init
      sortedRows.map(_._1).zip(offs).map { case (pid, off) =>
        (pid, key, off, tot)
      }
    }
    val offDf = offRows.toDF("__pid", keyCol, "__off", "tot")
    val w = Window.partitionBy(col("__pid"), col(keyCol))
      .orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offDf), Seq("__pid", keyCol))
      .withColumn("cum", sum(col(weightCol)).over(w) + col("__off"))
      .drop("__pid", "__off")
  }
}
