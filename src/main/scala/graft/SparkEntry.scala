package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query registry. Each key has a
  * Spark implementation in `queries` and (where SQL-expressible) a
  * DuckDB oracle in `oracleSql`; keys absent from `oracleSql` get the
  * driver's weaker rows-only check and are covered by ScalaTest specs
  * instead (LSH/SimHash/ANN/fingerprint — approximate or hash-seeded
  * ops with no portable SQL form).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      DialectQueries.queries ++ IndexOps.queries ++ CurationOps.queries ++
      ChunkOps.queries ++ StatsOps.queries ++ SearchOps.queries ++
      MiningOps.queries ++ MlOps.queries ++
      graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      DialectQueries.oracles ++ IndexOps.oracles ++ CurationOps.oracles ++
      ChunkOps.oracles ++ StatsOps.oracles ++ SearchOps.oracles ++
      MiningOps.oracles ++ MlOps.oracles ++
      graft.streaming.StreamOps.oracles
}
