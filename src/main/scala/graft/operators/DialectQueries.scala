package graft.operators

import graft.{Engine, EngineSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end dialect queries: mutable-dialect SQL text (double-quoted
  * strings, d'…' literals, implicit comma-joins, GROUP BY aliases) run
  * through graft's own lexer→parser→analyzer→planner against the
  * testdata tables, oracled by DuckDB like every other operator.
  * Texts adapted from /root/reference/benchmark/tpc-h/q{1,3,6,12,14}.sql
  * (dates/columns fitted to the driver's testdata schema). */
object DialectQueries {

  // one catalog per (session, sfDir): table schema reads are paid once
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), EngineSession]()

  private def run(sp: SparkSession, dir: String, sql: String): DataFrame =
    sessions.computeIfAbsent((sp, dir),
      _ => EngineSession.withTestdata(sp, dir)).query(sql)

  /** Like [[run]], but in a forked catalog — for query texts with DDL
    * side effects (CREATE/USE), so the shared session stays on
    * `testdata`. */
  private def runIsolated(sp: SparkSession, dir: String, sql: String): DataFrame =
    sessions.computeIfAbsent((sp, dir),
      _ => EngineSession.withTestdata(sp, dir)).fork().query(sql)

  val q1Text: String = """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           SUM(l_extendedprice) AS sum_base_price,
           SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           AVG(l_extendedprice) AS avg_price,
           AVG(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= d'2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus;"""

  val q3Text: String = """
    SELECT l_orderkey,
           SUM(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = "BUILDING"
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < d'1998-03-15 00:00:00'
      AND l_shipdate > d'1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10;"""

  val q6Text: String = """
    SELECT SUM(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= d'1996-01-01 00:00:00'
      AND l_shipdate < d'1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24;"""

  val q12Text: String = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND (l_returnflag = "R" OR l_returnflag = "A")
      AND l_shipdate >= d'1996-01-01 00:00:00'
      AND l_shipdate < d'1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority;"""

  val q14Text: String = """
    SELECT SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_type LIKE "PROMO%"
      AND l_shipdate >= d'1997-09-01 00:00:00'
      AND l_shipdate < d'1997-10-01 00:00:00';"""

  /** GROUP BY expression alias + HAVING + scalar subquery — the
    * dialect features Spark SQL itself doesn't have. */
  val bucketText: String = """
    SELECT bucket, COUNT(*) AS n, SUM(l_quantity) AS qty
    FROM lineitem
    WHERE l_quantity < (SELECT AVG(l_quantity) FROM lineitem)
    GROUP BY l_orderkey % 7 AS bucket
    HAVING COUNT(*) > 10
    ORDER BY bucket;"""

  /** Correlated scalar subquery — decorrelated by our planner via
    * grouping-lift (quantities are integral → engine-exact doubles). */
  val correlatedText: String = """
    SELECT l_orderkey, l_linenumber FROM lineitem AS l1
    WHERE l_quantity > 1.5 * (SELECT AVG(l2.l_quantity) FROM lineitem AS l2
                              WHERE l2.l_partkey = l1.l_partkey);"""

  /** Correlated subquery with an additional NON-equi correlated
    * predicate. The planner lifts it above the grouping (ref
    * QueryGraph.cpp:460-530): its inner side is the equi key, so the
    * lifted predicate filters the single matching group per outer row —
    * and because it depends only on the group key, row-level (SQL
    * standard / DuckDB) and group-level (reference) semantics agree,
    * making it oracle-checkable. */
  val correlatedNonEquiText: String = """
    SELECT l_orderkey, l_linenumber FROM lineitem AS l1
    WHERE l_quantity > 1.5 * (SELECT AVG(l2.l_quantity) FROM lineitem AS l2
                              WHERE l2.l_partkey = l1.l_partkey
                                AND l2.l_partkey < l1.l_suppkey * 40);"""

  /** Negative-/large-year DATE and DATETIME literals end-to-end:
    * INSERT through the dialect (proleptic java.time values), compare
    * and sort on ancient dates, return int keys (dates themselves
    * can't round-trip the driver's pandas compare — datetime64[ns]
    * caps at years 1677–2262). Fixture dates lifted from the shapes in
    * ref test/ours/data/D.csv. */
  val dateAncientText: String = """
    CREATE DATABASE graftdates;
    USE graftdates;
    CREATE TABLE dd (key INT(4) NOT NULL, rdate DATE NOT NULL,
                     rdatetime DATETIME NOT NULL);
    INSERT INTO dd VALUES
      (1, d'-4820-04-04', d'-0952-03-26 12:25:48'),
      (2, d'1999-12-31', d'2000-01-01 00:00:00'),
      (3, d'3065-12-18', d'1244-10-24 09:40:04'),
      (4, d'-1167-12-14', d'2836-05-23 12:46:49'),
      (5, d'0001-01-01', d'-4346-09-15 13:39:39');
    SELECT key FROM dd
    WHERE rdate < d'-1000-01-01' OR rdatetime > d'2000-01-01 00:00:00'
    ORDER BY rdate, key;"""

  private def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dialect_q1" -> ((s, d) => run(s, d, q1Text)),
    "dialect_q3" -> ((s, d) => run(s, d, q3Text)),
    "dialect_q6" -> ((s, d) => run(s, d, q6Text)),
    "dialect_q12" -> ((s, d) => run(s, d, q12Text)),
    "dialect_q14" -> ((s, d) => run(s, d, q14Text)),
    "dialect_groupby_alias" -> ((s, d) => run(s, d, bucketText)),
    "dialect_correlated" -> ((s, d) => run(s, d, correlatedText)),
    "dialect_correlated_nonequi" -> ((s, d) => run(s, d, correlatedNonEquiText)),
    "dialect_date_ancient" -> ((s, d) => runIsolated(s, d, dateAncientText)))

  val oracles: Map[String, String] = Map(
    "dialect_q1" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        ${sqlDsum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
        ${sqlDsum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
        ${sqlDsum("l_discount")} / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus""",
    "dialect_q3" -> s"""
      SELECT l_orderkey,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
        o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10""",
    "dialect_q6" -> s"""
      SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24""",
    "dialect_q12" -> """
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND (l_returnflag = 'R' OR l_returnflag = 'A')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_orderpriority""",
    "dialect_q14" -> s"""
      SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_type LIKE 'PROMO%'
        AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",
    "dialect_groupby_alias" -> s"""
      SELECT l_orderkey % 7 AS bucket, COUNT(*) AS n,
        ${sqlDsum("l_quantity")} AS qty
      FROM lineitem
      WHERE l_quantity < (SELECT AVG(l_quantity) FROM lineitem)
      GROUP BY l_orderkey % 7
      HAVING COUNT(*) > 10""",
    "dialect_correlated" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem l1
      WHERE l_quantity > 1.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l1.l_partkey)""",
    "dialect_correlated_nonequi" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem l1
      WHERE l_quantity > 1.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l1.l_partkey
                                  AND l2.l_partkey < l1.l_suppkey * 40)""",
    "dialect_date_ancient" -> """
      SELECT key FROM (VALUES
        (1, DATE '-4820-04-04', TIMESTAMP '-0952-03-26 12:25:48'),
        (2, DATE '1999-12-31', TIMESTAMP '2000-01-01 00:00:00'),
        (3, DATE '3065-12-18', TIMESTAMP '1244-10-24 09:40:04'),
        (4, DATE '-1167-12-14', TIMESTAMP '2836-05-23 12:46:49'),
        (5, DATE '0001-01-01', TIMESTAMP '-4346-09-15 13:39:39'))
        AS dd(key, rdate, rdatetime)
      WHERE rdate < DATE '-1000-01-01' OR rdatetime > TIMESTAMP '2000-01-01 00:00:00'
      ORDER BY rdate, key""")
}
