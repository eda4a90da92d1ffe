package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Tick → fixed-interval OHLCV bar aggregation.
  *
  * The reference ingests pre-built 5-minute bars from a vendor API
  * (`project/ingest_data.py:45-52`); our engine can additionally *build*
  * bars from a raw event/tick stream — the same operation the
  * Structured-Streaming extension performs incrementally
  * (graft.streaming.BarBuilder).
  *
  * Scale notes: one `groupBy(series, bucket)` → a single hash
  * aggregation with map-side partial aggregation; no window functions,
  * no per-series single-partition skew. Open/close come from
  * `min`/`max` over `struct(ts, value)` in the same pass (no
  * self-join, no sort) — NOT `min_by`/`max_by`, whose tie-break on
  * duplicate timestamps is nondeterministic across partial-aggregation
  * orders; the struct form totally orders ties by value, making batch
  * bars, streaming bars (graft.streaming.BarBuilder uses the same
  * struct trick), and the DuckDB oracle agree bit-for-bit.
  */
object MarketBars {

  val FiveMinutesMicros: Long = 5L * 60 * 1000 * 1000

  /** Floor a TimestampType column to an interval bucket, in microsecond
    * epoch arithmetic (deterministic, codegen-friendly, and identical
    * semantics to the DuckDB oracle's `epoch_us(ts)//step*step`). */
  def timeBucket(ts: Column, stepMicros: Long): Column =
    timestamp_micros((unix_micros(ts).cast("long") / stepMicros).cast("long") * stepMicros)

  /** Aggregate ticks into fixed-interval OHLCV bars.
    *
    * @param df        tick rows
    * @param seriesCol series key (e.g. event_type / symbol)
    * @param tsCol     TimestampType event time
    * @param valueCol  tick price/value (double)
    */
  def bars(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      stepMicros: Long = FiveMinutesMicros): DataFrame = {
    df.groupBy(
        col(seriesCol).as("series"),
        timeBucket(col(tsCol), stepMicros).as("bar_ts"))
      .agg(
        min(struct(col(tsCol).as("t"), col(valueCol).as("v"))).getField("v").as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(struct(col(tsCol).as("t"), col(valueCol).as("v"))).getField("v").as("close"),
        count(lit(1)).as("n_ticks"),
        // exact decimal accumulation → stable double, independent of
        // partial-aggregation order (double-sum order varies at scale)
        sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType).as("volume"))
  }

  val OneHourMicros: Long = 60L * 60 * 1000 * 1000

  /** Re-aggregate fine bars into coarser bars (5-min → 1-h etc.) —
    * the bar-hierarchy rollup that lets every coarser granularity
    * derive from the bar store instead of rescanning raw ticks.
    * Same one-shuffle OHLCV shape as [[bars]]; open/close pick by
    * min/max struct over the (unique within a bucket) fine bar_ts, so
    * the pick is deterministic; volumes/counts re-sum exactly
    * (decimal in, decimal rollup). */
  def resample(bars: DataFrame, stepMicros: Long): DataFrame =
    bars.groupBy(
        col("series"),
        timeBucket(col("bar_ts"), stepMicros).as("bar_ts"))
      .agg(
        min(struct(col("bar_ts").as("t"), col("open").as("v")))
          .getField("v").as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max(struct(col("bar_ts").as("t"), col("close").as("v")))
          .getField("v").as("close"),
        sum(col("n_ticks")).as("n_ticks"),
        sum(col("volume").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("volume"))
}
