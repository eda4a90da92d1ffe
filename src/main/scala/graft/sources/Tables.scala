package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Spark-native analog of the reference's sources: the reference reads
  * multiline JSON payloads (`project/transform_data.py:36-43`) and JDBC
  * tables (`audit_pipeline.py:92-99`); our engine's canonical columnar
  * source is Parquet, which supports predicate pushdown and column
  * pruning at the scan (verified via `.explain` — `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a compute-heavy map stage across the cluster when the scan
    * produced fewer splits than cores (a small file arrives as ONE
    * split, serializing everything downstream on one core — exactly
    * what happened to the tokenize/minhash stages). At real scale the
    * scan already has >= cores splits and this is a no-op; the check
    * reads only the plan's partitioning, it runs no job. */
  def rebalance(df: DataFrame): DataFrame = graft.ops.Dist.rebalance(df)

  /** JDBC table scan (S2 — `audit_pipeline.py:92-99`). Catalyst pushes
    * IS NOT NULL / comparison predicates and column pruning into the
    * generated SQL (asserted plan-level in JdbcSpec, which round-trips
    * against embedded Derby). */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and expose:
    *   - `ts`    : TimestampType truncated to micros — this matches the
    *               DuckDB oracle byte-for-byte (DuckDB 1.0 likewise
    *               truncates parquet ns → µs on read);
    *   - `ts_ns` : the raw nanosecond epoch long (full fidelity, used
    *               for deterministic ordering / tie-breaks).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
