package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, LlmQueries, MarketQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator inventories; each entry
  * has a DuckDB twin in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's flagship pipeline (transform_data.py:183-212)
    * re-expressed over the driver testdata: tick events → 5-minute
    * OHLCV bars → pair align join → log spread → rolling 60-bar
    * z-score with 30-bar warm-up → per-symbol leg reshape.
    */
  def entry(spark: SparkSession): DataFrame =
    MarketQueries.queries("q06_pair_zscore")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ MarketQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ MarketQueries.oracleSql ++ LlmQueries.oracleSql
}
