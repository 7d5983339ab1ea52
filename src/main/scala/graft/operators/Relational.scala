package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.1/§2.3): scan, filter
  * (incl. disjunctive), n-ary joins (equi/theta/pk-fk/n2m), projection,
  * grouping (expr keys with alias), global aggregation, sorting,
  * limit/offset, HAVING, scalar + correlated subqueries, LIKE, string
  * ops, ISNULL, casts — each shaped after the reference's operator set
  * (`/root/reference/include/mutable/IR/Operator.hpp:560-572`, TPC-H
  * queries in `/root/reference/benchmark/tpc-h/`).
  *
  * Oracle-parity rule: every floating SUM is computed as
  * `SUM(CAST(expr AS DECIMAL(18,6)))` then cast back to DOUBLE (scale 6 represents every product of the 2-decimal inputs exactly — no rounding midpoints where HALF_UP vs HALF_EVEN could disagree). Decimal
  * addition is exact and associative, so Spark and DuckDB produce
  * bit-identical doubles regardless of partial-aggregation order. AVG is
  * derived as exact-sum / count for the same reason.
  */
object Relational {

  import Exact.{dsum, sqlDsum}
  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def t(sp: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(sp, dir, n)

  // ---------------------------------------------------------------- TPC-H

  /** Q1 pricing summary — Grouping + multi-aggregate (ref
    * benchmark/tpc-h/q1.sql, dates adapted to testdata range). */
  def q1(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Oracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
      ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
      ${sqlDsum("l_discount")} / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  /** Q3 shipping priority — 3-way join + grouping + top-k (ref
    * benchmark/tpc-h/q3.sql). customer filter is applied before the
    * join so the scan prunes; join order left to Catalyst/AQE. */
  def q3(sp: SparkSession, dir: String): DataFrame = {
    val c = t(sp, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(sp, dir, "orders").filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
    val l = t(sp, dir, "lineitem").filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String = s"""
    SELECT l_orderkey,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, orders.o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10"""

  /** Q6 forecast revenue — filter + global aggregation (ref
    * benchmark/tpc-h/q6.sql). Filters push to the parquet scan. */
  def q6(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q6Oracle: String = s"""
    SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24"""

  /** Q12-shaped: pk-fk join + disjunctive filter + grouping (ref
    * benchmark/tpc-h/q12.sql; l_shipmode doesn't exist in testdata so
    * the disjunction runs on l_returnflag and grouping on priority). */
  def q12(sp: SparkSession, dir: String): DataFrame = {
    val o = t(sp, dir, "orders")
    val l = t(sp, dir, "lineitem")
      .filter((col("l_returnflag") === "R" || col("l_returnflag") === "A") &&
        col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  val q12Oracle: String = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND (l_returnflag = 'R' OR l_returnflag = 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority"""

  /** Q14 promo revenue — join + conditional aggregate ratio (ref
    * benchmark/tpc-h/q14.sql). `part` is a dimension at test scale;
    * Catalyst/AQE broadcast it automatically — we keep the explicit
    * hint off because part scales with SF at 100 TB. */
  def q14(sp: SparkSession, dir: String): DataFrame = {
    val l = t(sp, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-09-01 00:00:00") &&
        col("l_shipdate") < ts("1997-10-01 00:00:00"))
    val p = t(sp, dir, "part")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("promo_revenue"))
  }

  val q14Oracle: String = s"""
    SELECT 100.0 *
      ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} /
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""

  // ------------------------------------------------- operator microbench

  /** pk-fk equi-join (ref benchmark/operators equi_join_pk_fk). */
  def joinPkFk(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "orders")
      .join(t(sp, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_price"))

  val joinPkFkOracle: String = s"""
    SELECT c_mktsegment, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total_price
    FROM orders, customer WHERE o_custkey = c_custkey
    GROUP BY c_mktsegment"""

  /** n:m equi-join on a non-key column (ref equi_join_n2m). */
  def joinN2M(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "customer")
      .join(t(sp, dir, "supplier"), col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal") + col("s_acctbal")).as("bal"))

  val joinN2MOracle: String = s"""
    SELECT c_nationkey AS nationkey, COUNT(*) AS n,
      ${sqlDsum("c_acctbal + s_acctbal")} AS bal
    FROM customer, supplier WHERE c_nationkey = s_nationkey
    GROUP BY c_nationkey"""

  /** theta join (non-equi) → BroadcastNestedLoopJoin; sampled left side
    * keeps the cross product bounded at any SF. */
  def thetaJoin(sp: SparkSession, dir: String): DataFrame = {
    val a = t(sp, dir, "part").filter(col("p_partkey") % 97 === 0)
      .select(col("p_partkey").as("a_key"), col("p_size").as("a_size"))
    val b = t(sp, dir, "part").select(col("p_size").as("b_size"))
    a.join(b, col("a_size") < col("b_size"))
      .groupBy(col("a_size"))
      .agg(count(lit(1)).as("n"))
  }

  val thetaJoinOracle: String = """
    SELECT a.p_size AS a_size, COUNT(*) AS n
    FROM part a, part b
    WHERE a.p_partkey % 97 = 0 AND a.p_size < b.p_size
    GROUP BY a.p_size"""

  /** 5-way star join — exercises join ordering; region/nation are
    * bounded dims → explicit broadcast survives any scale factor. */
  def join5Way(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .join(t(sp, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(sp, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(sp, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(sp, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("rev"))

  val join5WayOracle: String = s"""
    SELECT r_name, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS rev
    FROM region, nation, customer, orders, lineitem
    WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY r_name"""

  /** Left-semi join (EXISTS shape). */
  def semiJoin(sp: SparkSession, dir: String): DataFrame = {
    val bigOrders = t(sp, dir, "orders").filter(col("o_totalprice") > 300000.0)
    t(sp, dir, "customer")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
  }

  val semiJoinOracle: String = """
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)"""

  /** Left-anti join (NOT EXISTS shape). */
  def antiJoin(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "customer")
      .join(t(sp, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val antiJoinOracle: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""

  /** Single-key grouping (ref group_by_i32_single). */
  def groupBySingle(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))

  val groupBySingleOracle: String =
    "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"

  /** Multi-key grouping (ref group_by_i32_multiple). */
  def groupByMulti(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  val groupByMultiOracle: String = s"""
    SELECT l_returnflag, l_linestatus, l_linenumber, COUNT(*) AS n,
      ${sqlDsum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus, l_linenumber"""

  /** Expression grouping key with alias — mutable's `GROUP BY expr AS
    * alias` feature (ref Sema.cpp:1271-1305). */
  def groupByExprAlias(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .groupBy((col("l_orderkey") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("rev"))

  val groupByExprAliasOracle: String = s"""
    SELECT l_orderkey % 10 AS bucket, COUNT(*) AS n,
      ${sqlDsum("l_extendedprice")} AS rev
    FROM lineitem GROUP BY l_orderkey % 10"""

  /** Skew-mitigating two-stage aggregation: salt the hot grouping key
    * (l_returnflag has only 3 values → 3 reducers would own the whole
    * table), partially aggregate per (key, salt), then re-aggregate.
    * The oracle is the plain GROUP BY — salting must be invisible in
    * the result. Re-summing the exact partial sums stays exact because
    * every partial is an integer multiple of 1e-6 (see Exact). */
  def groupBySalted(sp: SparkSession, dir: String): DataFrame = {
    val partial = t(sp, dir, "lineitem")
      .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
      .agg(count(lit(1)).as("pn"), dsum(col("l_extendedprice")).as("psum"))
    partial.groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).as("n"), dsum(col("psum")).as("total"))
  }

  val groupBySaltedOracle: String = s"""
    SELECT l_returnflag, COUNT(*) AS n,
      ${sqlDsum("l_extendedprice")} AS total
    FROM lineitem GROUP BY l_returnflag"""

  /** Global aggregation, no keys → exactly one row (ref
    * AggregationOperator, Operator.hpp:503-538). */
  def aggGlobal(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      dsum(col("l_extendedprice")).as("sum_price"),
      (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))

  val aggGlobalOracle: String = s"""
    SELECT COUNT(*) AS n, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      ${sqlDsum("l_extendedprice")} AS sum_price,
      ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price
    FROM lineitem"""

  /** ORDER BY multi-key + LIMIT/OFFSET; unique tie-break keys make the
    * result deterministic under sorted-compare. */
  def orderByTopK(sp: SparkSession, dir: String): DataFrame =
    Engine.sql(sp, dir, orderByTopKOracle)

  val orderByTopKOracle: String = """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100 OFFSET 10"""

  /** DISTINCT projection (ref group_by_i32_distinct shape). */
  def distinctPairs(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  val distinctPairsOracle: String =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** HAVING — filter over grouped result (ref QueryGraph.cpp:1773-1791
    * rewrites HAVING to a filter over a nested grouped query). */
  def havingGroups(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 5)

  val havingGroupsOracle: String = """
    SELECT l_suppkey, COUNT(*) AS n FROM lineitem
    GROUP BY l_suppkey HAVING COUNT(*) > 5"""

  /** Scalar (uncorrelated) subquery in WHERE (ref Sema.cpp:953-1070).
    * l_quantity is integral so sum/avg are exact doubles on both
    * engines — boundary-safe. */
  def scalarSubquery(sp: SparkSession, dir: String): DataFrame =
    Engine.sql(sp, dir, scalarSubqueryOracle)

  val scalarSubqueryOracle: String = """
    SELECT COUNT(*) AS n_above FROM lineitem
    WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)"""

  /** Correlated scalar subquery — decorrelated by Catalyst into an
    * aggregate+join (ref QueryGraph.cpp:30-340 decorrelation). */
  def correlatedSubquery(sp: SparkSession, dir: String): DataFrame =
    Engine.sql(sp, dir, correlatedSubqueryOracle)

  val correlatedSubqueryOracle: String = """
    SELECT l_orderkey, l_linenumber FROM lineitem l1
    WHERE l_quantity > 1.5 * (SELECT AVG(l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l1.l_partkey)"""

  /** LIKE prefix/contains/suffix (ref WasmUtil.hpp:1367-1379
    * like_prefix/contains/suffix specializations). */
  def likeOps(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "part").agg(
      sum(when(col("p_type").like("PROMO%"), 1).otherwise(0)).as("n_prefix"),
      sum(when(col("p_name").like("%a%"), 1).otherwise(0)).as("n_contains"),
      sum(when(col("p_brand").like("%3"), 1).otherwise(0)).as("n_suffix"))

  val likeOpsOracle: String = """
    SELECT
      CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
      CAST(SUM(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
      CAST(SUM(CASE WHEN p_brand LIKE '%3' THEN 1 ELSE 0 END) AS BIGINT) AS n_suffix
    FROM part"""

  /** Projection expressions: concat (mutable `..`), substring, upper,
    * length (ref Sema.cpp:794-811). */
  def stringOps(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "part")
      .filter(col("p_partkey") % 10 === 0)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"))

  val stringOpsOracle: String = """
    SELECT p_partkey, p_brand || ':' || p_type AS brand_type,
      UPPER(p_name) AS uname, CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      SUBSTR(p_name, 1, 5) AS name5
    FROM part WHERE p_partkey % 10 = 0"""

  /** ISNULL + three-valued logic (ref Functions.tbl ISNULL). */
  def isnullOps(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "customer").agg(
      sum(when(isnull(nullif(col("c_mktsegment"), lit("BUILDING"))), 1).otherwise(0)).as("n_null"),
      count(nullif(col("c_mktsegment"), lit("BUILDING"))).as("n_nonnull"))

  val isnullOpsOracle: String = """
    SELECT
      CAST(SUM(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_nonnull
    FROM customer"""

  /** Casts: double→int, bigint→double, bool→int (ref `INT(x)`,
    * Sema.cpp:645-676). */
  def castOps(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "lineitem")
      .filter(col("l_orderkey") % 1000 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_orderkey").cast("double").as("key_dbl"),
        (col("l_returnflag") === "R").cast("int").as("flag_int"))

  val castOpsOracle: String = """
    SELECT l_orderkey, l_linenumber,
      CAST(l_quantity AS INT) AS qty_int,
      CAST(l_orderkey AS DOUBLE) AS key_dbl,
      CAST(l_returnflag = 'R' AS INT) AS flag_int
    FROM lineitem WHERE l_orderkey % 1000 = 0"""

  /** Filter over date/timestamp comparisons (ref WHERE-over-date
    * end2end tests). */
  def dateFilter(sp: SparkSession, dir: String): DataFrame =
    t(sp, dir, "orders")
      .filter(col("o_orderdate") >= ts("1999-06-01 00:00:00") &&
        col("o_orderdate") < ts("1999-09-01 00:00:00"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  val dateFilterOracle: String = s"""
    SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-09-01 00:00:00'
    GROUP BY o_orderstatus"""

  // ------------------------------------------------------------ registry

  /** Revenue concentration (Pareto audit): customers ranked by total
    * spend, bucketed into rank deciles, each decile's share of total
    * revenue reported cumulatively — "do the top 10% of customers
    * carry 50% of revenue?". Scale discipline: the fact table
    * aggregates FIRST (one hash shuffle, |customers| rows out), and
    * the global rank over that aggregate is DISTRIBUTED — a single-
    * partition row_number window here would pull every customer of a
    * 100 TB fact table through one task (the round-10 WindowExec
    * warning this op used to carry). Classic parallel ranking
    * instead: range-partition by the rank key (so partition order IS
    * global order), rank locally per partition, and add each
    * partition's start offset, computed from one ≤|shuffle
    * partitions|-row driver fetch of per-partition counts (which also
    * yields n_cust and total revenue — replacing the old broadcast
    * cross-join). The persist pins spark_partition_id between the
    * stats fetch and the final pass (range partitioning is sampling-
    * based, so an unpinned recompute could re-draw boundaries). The
    * only remaining global-order window runs over the ≤10 decile
    * rows. Money stays a SCALED-INTEGER cent sum end to end
    * (2-decimal inputs, the Exact argument at scale 2): per-bucket
    * sums are long adds, and the only doubles are final divisions of
    * exact integers — IEEE-deterministic on both engines. The rank is
    * made unique by (spend DESC, custkey ASC), so decile assignment
    * has no tie nondeterminism and is invariant to where the range
    * boundaries land; bucket = (rn-1)·10 div n + 1, pure integer. */
  def pareto(sp: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import sp.implicits._
    val perCust = t(sp, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(rint(col("o_totalprice") * 100).cast("long")).as("cents"))
    val sorted = perCust
      .repartitionByRange(col("cents").desc, col("o_custkey").asc)
      .withColumn("pid", spark_partition_id())
      .persist()
    val stats = sorted.groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("c"))
      .collect() // bounded: one row per shuffle partition
      .map(r => (r.getAs[Int]("pid"), r.getAs[Long]("cnt"), r.getAs[Long]("c")))
      .sortBy(_._1)
    val nCust = math.max(1L, stats.map(_._2).sum)
    val totCents = stats.map(_._3).sum
    val offs = stats.map(_._2).scanLeft(0L)(_ + _).init
    val offDf = stats.map(_._1).zip(offs).toSeq.toDF("pid", "off")
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("cents").desc, col("o_custkey").asc)
    val ranked = sorted.join(broadcast(offDf), Seq("pid"))
      .withColumn("rn", row_number().over(wLocal) + col("off"))
      .withColumn("bucket", expr(s"(rn - 1) * 10 div ${nCust}L + 1"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("b_cents"))
      .withColumn("cum_cents", sum(col("b_cents")).over(wCum))
      .select(col("bucket"), col("n_customers"),
        (col("b_cents").cast("double") / 100).as("revenue"),
        (col("cum_cents").cast("double") / lit(totCents).cast("double"))
          .as("cum_share"))
  }

  val paretoOracle: String = """
    WITH pc AS (
      SELECT o_custkey,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS cents
      FROM orders GROUP BY o_custkey),
    tot AS (SELECT COUNT(*) AS n_cust, CAST(SUM(cents) AS BIGINT)
              AS tot_cents FROM pc),
    ranked AS (
      SELECT cents,
        (ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) - 1) * 10
          // (SELECT n_cust FROM tot) + 1 AS bucket
      FROM pc),
    b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(cents) AS BIGINT) AS b_cents
      FROM ranked GROUP BY bucket)
    SELECT bucket, n_customers,
      CAST(b_cents AS DOUBLE) / 100 AS revenue,
      CAST(SUM(b_cents) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / (SELECT CAST(tot_cents AS DOUBLE) FROM tot) AS cum_share
    FROM b"""

  private val JoinSalts = 8

  /** Skew-mitigating SALTED JOIN — the join-side twin of
    * [[groupBySalted]]: documents carry only 5 distinct langs, so a
    * shuffled equi-join on lang alone would land ~20% of the corpus
    * on each of 5 reducers no matter how many executors exist. Salting
    * spreads each hot key over [[JoinSalts]] reducers: the fact side
    * derives a DETERMINISTIC salt (doc_id % salts — never rand(),
    * which would break retries and oracle parity), the dim side is
    * replicated ×salts (dim_rows × salts stays tiny), and the join
    * key becomes (lang, salt). The shuffle-hash hint keeps the demo a
    * real shuffled join — a broadcast would hide the skew this op
    * exists to break (on a real cluster the dim would be broadcast
    * and this shape reserved for dim tables too big to broadcast; AQE
    * skew-split is the adaptive alternative when salting isn't
    * planned in). The oracle is the plain unsalted join — salting
    * must be invisible in the result. */
  def joinSaltedSkew(sp: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(sp, dir, "documents")
    val dim = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("lang_docs"), sum(col("n_chars")).as("lang_chars"))
    val dimSalted = dim.crossJoin(
      sp.range(0, JoinSalts).select(col("id").cast("int").as("salt")))
    val factSalted = docs
      .withColumn("salt", pmod(col("doc_id"), lit(JoinSalts)).cast("int"))
    factSalted.join(dimSalted.hint("shuffle_hash"), Seq("lang", "salt"))
      .select(col("doc_id"), col("lang"), col("lang_docs"), col("lang_chars"))
  }

  val joinSaltedSkewOracle: String = """
    SELECT d.doc_id, d.lang, s.lang_docs, s.lang_chars
    FROM documents d
    JOIN (SELECT lang, CAST(COUNT(*) AS BIGINT) AS lang_docs,
            CAST(SUM(n_chars) AS BIGINT) AS lang_chars
          FROM documents GROUP BY lang) s
      ON d.lang = s.lang"""

  /** Per-customer running spend: a cumulative window aggregate over
    * the orders fact — the canonical "customer lifetime value over
    * time" query. ONE hash exchange on o_custkey, then a sorted
    * per-partition scan; the frame is an explicit ROWS
    * unbounded→current run over the UNIQUE (o_orderdate, o_orderkey)
    * order, so RANGE-vs-ROWS ambiguity never arises and both engines
    * see the same frame. The cumulative sum uses [[Exact.dsumOver]]:
    * scaled-integer addition inside the frame is exact and
    * order-independent, so the running doubles are bit-identical to
    * the oracle's DECIMAL(18,6) accumulation at every prefix, not
    * just the final total. Scale: state per partition is one long;
    * output is input-linear; skew bounded by orders-per-customer. */
  def runningTotal(sp: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(sp, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ in the parquet; the session TZ
        // is pinned UTC, so the cast is the identity mapping
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
        Exact.dsumOver(col("o_totalprice"), w).as("running_spend"))
  }

  val runningTotalOracle: String = """
    SELECT o_custkey, o_orderkey,
      CAST(epoch_ms(o_orderdate) AS BIGINT) AS order_ms,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend
    FROM orders"""

  /** Bloom-prefiltered PK-FK join: monthly revenue of URGENT orders,
    * with the fact side (lineitem) pruned by a Bloom filter built
    * from the filtered dimension's join keys BEFORE the shuffle — the
    * explicit form of the semi-join reduction Spark's AQE runtime
    * filter injects when statistics justify it. At 100 TB this is
    * what turns "shuffle the whole fact table" into "shuffle the ~20%
    * that can match": the filter drops non-matching rows at the scan,
    * and the join itself removes the Bloom's false positives, so the
    * result is EXACTLY the plain join (the oracle is the plain join —
    * any Bloom semantics leak would hash-mismatch).
    *
    * Sizing note: `expectedNumItems` comes from one count job on the
    * build side (same pattern as DedupOps.bloomFilterDedupFrom); the
    * sketch stays driver-/executor-broadcastable to ~10^8 keys
    * (~100 MB at 1% fpp) — beyond that, drop the explicit filter and
    * rely on AQE's own runtime filter. The probe is a UDF because
    * Spark exposes no public might_contain expression. */
  def joinBloomPrefilter(sp: SparkSession, dir: String): DataFrame = {
    // cached: referenced three times (the sizing count, the Bloom
    // build's treeAggregate, and the join) — uncached that is three
    // scans of orders; the pin is the filtered 2-column projection
    val urgent = t(sp, dir, "orders")
      .filter(col("o_orderpriority") === lit("1-URGENT"))
      .select(col("o_orderkey"), col("o_orderdate"))
      .cache()
    val bloom = urgent.stat.bloomFilter(
      "o_orderkey", math.max(urgent.count(), 64L), 0.01)
    val bc = sp.sparkContext.broadcast(bloom)
    val might = udf((k: Long) => bc.value.mightContainLong(k))
    t(sp, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(might(col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate")))
        .as("month_ts"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  val joinBloomPrefilterOracle: String = s"""
    SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
        AS month_ts,
      COUNT(*) AS n_items,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY date_trunc('month', o_orderdate)"""

  /** Order-to-ship latency distribution per order priority: exact
    * p50/p90/p99 of datediff(l_shipdate, o_orderdate) — the
    * fulfillment-SLA audit ("do URGENT orders actually ship faster,
    * and by how much at the tail?"). One PK-FK shuffle join
    * (lineitem → orders on orderkey), then the
    * [[graft.operators.StatsOps.lengthQuantiles]] distribution
    * discipline: aggregate to (priority, days) counts — bounded by
    * priorities × distinct latencies, never rows — and take discrete
    * quantiles from the cumulative window over that tiny aggregate.
    * All integer (day diffs, ceil-rank on identical doubles) →
    * hash-exact. */
  def shipLatency(sp: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Engine.table(sp, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Engine.table(sp, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val counts = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
      .groupBy(col("priority"), col("days")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("priority")).orderBy(col("days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("priority"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
    val qs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)).map {
      case (name, p) =>
        min(when(col("cum") >= ceil(lit(p) * col("tot")), col("days"))).as(name)
    }
    val aggs = max(col("tot")).as("n_items") +: max(col("days")).as("max_days") +: qs
    cum.groupBy(col("priority")).agg(aggs.head, aggs.tail: _*)
  }

  val shipLatencyOracle: String = """
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
        CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    counts AS (
      SELECT priority, days, CAST(COUNT(*) AS BIGINT) AS c
      FROM d GROUP BY priority, days),
    cum AS (
      SELECT priority, days,
        SUM(c) OVER (PARTITION BY priority ORDER BY days
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(c) OVER (PARTITION BY priority) AS tot
      FROM counts)
    SELECT priority, CAST(MAX(tot) AS BIGINT) AS n_items,
      MAX(days) AS max_days,
      MIN(CASE WHEN cum >= CEIL(0.5 * tot) THEN days END) AS p50,
      MIN(CASE WHEN cum >= CEIL(0.9 * tot) THEN days END) AS p90,
      MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN days END) AS p99
    FROM cum GROUP BY priority"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_ship_latency" -> (shipLatency _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "orders_running_total" -> (runningTotal _),
    "orders_pareto" -> (pareto _),
    "join_salted_skew" -> (joinSaltedSkew _),
    "q1_pricing_summary" -> (q1 _),
    "q3_shipping_priority" -> (q3 _),
    "q6_forecast_revenue" -> (q6 _),
    "q12_priority_count" -> (q12 _),
    "q14_promo_revenue" -> (q14 _),
    "join_pk_fk" -> (joinPkFk _),
    "join_n2m" -> (joinN2M _),
    "join_theta" -> (thetaJoin _),
    "join_5way_star" -> (join5Way _),
    "join_semi" -> (semiJoin _),
    "join_anti" -> (antiJoin _),
    "group_by_single" -> (groupBySingle _),
    "group_by_multi" -> (groupByMulti _),
    "group_by_expr_alias" -> (groupByExprAlias _),
    "group_by_salted_skew" -> (groupBySalted _),
    "agg_global" -> (aggGlobal _),
    "order_by_topk" -> (orderByTopK _),
    "distinct_pairs" -> (distinctPairs _),
    "having_groups" -> (havingGroups _),
    "subquery_scalar" -> (scalarSubquery _),
    "subquery_correlated" -> (correlatedSubquery _),
    "like_ops" -> (likeOps _),
    "string_ops" -> (stringOps _),
    "isnull_ops" -> (isnullOps _),
    "cast_ops" -> (castOps _),
    "date_filter" -> (dateFilter _))

  val oracles: Map[String, String] = Map(
    "orders_ship_latency" -> shipLatencyOracle,
    "join_bloom_prefilter" -> joinBloomPrefilterOracle,
    "orders_running_total" -> runningTotalOracle,
    "orders_pareto" -> paretoOracle,
    "join_salted_skew" -> joinSaltedSkewOracle,
    "q1_pricing_summary" -> q1Oracle,
    "q3_shipping_priority" -> q3Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q12_priority_count" -> q12Oracle,
    "q14_promo_revenue" -> q14Oracle,
    "join_pk_fk" -> joinPkFkOracle,
    "join_n2m" -> joinN2MOracle,
    "join_theta" -> thetaJoinOracle,
    "join_5way_star" -> join5WayOracle,
    "join_semi" -> semiJoinOracle,
    "join_anti" -> antiJoinOracle,
    "group_by_single" -> groupBySingleOracle,
    "group_by_multi" -> groupByMultiOracle,
    "group_by_expr_alias" -> groupByExprAliasOracle,
    "group_by_salted_skew" -> groupBySaltedOracle,
    "agg_global" -> aggGlobalOracle,
    "order_by_topk" -> orderByTopKOracle,
    "distinct_pairs" -> distinctPairsOracle,
    "having_groups" -> havingGroupsOracle,
    "subquery_scalar" -> scalarSubqueryOracle,
    "subquery_correlated" -> correlatedSubqueryOracle,
    "like_ops" -> likeOpsOracle,
    "string_ops" -> stringOpsOracle,
    "isnull_ops" -> isnullOpsOracle,
    "cast_ops" -> castOpsOracle,
    "date_filter" -> dateFilterOracle)
}
