package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Single-partition-window audit (round 11). A `Window`/
  * `WindowGroupLimit` with an empty partitionSpec executes in ONE task
  * no matter how many executors exist — the r10 bench tail's
  * "No Partition Defined for Window operation" warnings. That shape is
  * only 100-TB-safe when its input is a BOUNDED aggregate whose size is
  * set by a value domain or a fixed constant, never by corpus rows.
  *
  * This spec walks the optimized logical plan of EVERY registered
  * query and asserts set-equality between the queries that carry a
  * global window and the allowlist below, where each entry names its
  * bound. Adding a global window to a query without naming its bound
  * here fails the suite; so does allowlist rot (an entry whose window
  * disappeared).
  *
  * `orders_pareto` is the op this audit fixed rather than justified:
  * its customer-rank window scaled with |customers|, and is now a
  * distributed range-partition + per-partition-offset rank
  * (Relational.pareto) — the surviving global window runs over ≤10
  * decile rows. */
class WindowAuditSpec extends AnyFunSuite {
  import TestSession._

  /** query name -> the named bound of every global window in its final
    * plan. Bounds must be value-domain or constant sized — never a
    * corpus dimension (rows, users, customers, distinct timestamps).
    * `events_rfm` used to be here with three |users|-scaling
    * distributions (ms-granular recency, exact cent sums); it now
    * runs ScaleWindows.cumulative and carries no global window. */
  private val namedBounds: Map[String, String] = Map(
    "orders_pareto" ->
      "<=10 decile rows (customer rank itself is distributed: range-partition + per-partition offsets, Relational.pareto)",
    "pipeline_curriculum" ->
      "per-n_chars count distribution: bounded by the document LENGTH domain (distinct lengths), not corpus rows",
    "pipeline_mix_temperature" ->
      "per-source count table: one row per source (enum-sized dimension)",
    "sim_knn_outliers" ->
      "per-mille mean-cosine distribution: mq in [-10^4, 10^4] -> <=2*10^4+2 rows by construction (SimilarityOps.meanQ)",
    "stats_ks_drift" ->
      "per-n_chars totals: document LENGTH domain, same bound as pipeline_curriculum",
    "stats_vocab_growth" ->
      "exactly 10 discovery-decile rows (1..10 spine)")

  private def globalWindows(p: LogicalPlan): Seq[String] = p.collect {
    case w: logical.Window if w.partitionSpec.isEmpty =>
      s"Window(${w.windowExpressions.map(_.name).mkString(",")})"
    case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty =>
      s"WindowGroupLimit(limit=${w.limit})"
  }

  test("every single-partition window runs over a named bounded aggregate") {
    val found = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val wins =
        try globalWindows(q(spark, sf).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at $sf: ${e.getMessage}")
        }
      if (wins.isEmpty) None else Some(name -> wins)
    }.toMap

    val unjustified = found.keySet -- namedBounds.keySet
    assert(unjustified.isEmpty,
      s"queries with a single-partition window but no named bound: " +
        unjustified.toSeq.sorted.map(n => s"$n ${found(n).mkString("; ")}")
          .mkString("\n  ", "\n  ", ""))

    val rotted = namedBounds.keySet -- found.keySet
    assert(rotted.isEmpty,
      s"allowlist entries whose global window no longer exists: " +
        rotted.toSeq.sorted.mkString(", "))
  }
}
