package graft.operators

import graft.Engine
import graft.storage.Indexes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-backed access paths (ref CREATE INDEX → IndexScan physical
  * operator, include/mutable/storage/Index.hpp + pattern
  * Filter(Scan) in src/backend/WasmOperator.hpp:397): a sorted-array
  * index and a learned (RMI) index over an integer key, both serving
  * range/point predicates by driver-side partition pruning plus
  * partition-local bounded search — no full scan, no shuffle at
  * lookup time.
  *
  * Correctness gate: both lookups are plain range predicates, so the
  * DuckDB oracle is WHERE BETWEEN / equality on the same tables.
  */
object IndexOps {

  // Key bounds chosen to exist at every SF (orderkeys are dense from 0).
  private val RangeLo = 100L
  private val RangeHi = 499L
  private val PointKey = 42L

  /** ArrayIndex range scan on orders.o_orderkey. */
  def rangeScan(sp: SparkSession, dir: String): DataFrame = {
    val idx = Indexes.build(Engine.table(sp, dir, "orders"), "o_orderkey",
      Indexes.ArrayMethod)
    val out = idx.rangeScan(RangeLo, RangeHi)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    out
  }

  val rangeScanOracle: String = s"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey BETWEEN $RangeLo AND $RangeHi"""

  /** RMI point lookup on lineitem.l_orderkey (n:m key — several rows
    * per key, exercising lowerBound/upperBound over duplicates). */
  def pointLookup(sp: SparkSession, dir: String): DataFrame = {
    val idx = Indexes.build(Engine.table(sp, dir, "lineitem"), "l_orderkey",
      Indexes.RmiMethod)
    idx.pointLookup(PointKey)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"))
  }

  val pointLookupOracle: String = s"""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem WHERE l_orderkey = $PointKey"""

  // A one-month window that exists at every SF (orderdates span 1995-2001).
  private val DateLo = java.time.LocalDate.of(1996, 3, 1)
  private val DateHi = java.time.LocalDate.of(1996, 3, 31)

  /** ArrayIndex range scan on a temporal key (orders.o_orderdate,
    * stored as a midnight-aligned timestamp in the testdata) — keys
    * map to epoch millis (true DATE columns map to epoch days; see
    * Indexes.keyToLong), fence pruning and local bounds unchanged.
    * The upper bound is DateHi midnight inclusive, matching SQL's
    * date→timestamp coercion in BETWEEN. */
  def dateRange(sp: SparkSession, dir: String): DataFrame = {
    val idx = Indexes.build(Engine.table(sp, dir, "orders"), "o_orderdate",
      Indexes.ArrayMethod)
    def ms(d: java.time.LocalDate): Long =
      d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    idx.rangeScan(ms(DateLo), ms(DateHi))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
  }

  val dateRangeOracle: String = s"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders WHERE o_orderdate BETWEEN DATE '$DateLo' AND DATE '$DateHi'"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "index_range_scan" -> (rangeScan _),
    "index_point_lookup" -> (pointLookup _),
    "index_date_range" -> (dateRange _))

  val oracles: Map[String, String] = Map(
    "index_range_scan" -> rangeScanOracle,
    "index_point_lookup" -> pointLookupOracle,
    "index_date_range" -> dateRangeOracle)
}
