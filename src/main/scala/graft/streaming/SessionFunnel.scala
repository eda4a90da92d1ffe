package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming funnel-within-session — the live twin of
  * `ops/EventAnalytics.sessionFunnel` (q209): did the user reach
  * `toType` after `fromType` inside the SAME activity session?
  * Emitted per closed session the moment the watermark passes its
  * extension horizon, instead of in a nightly batch.
  *
  * Built on the same `session_window` state as [[Sessionizer]]
  * (strict `gap >= 30 min` merge rule — the window is
  * [start, last+gap), agreeing with the batch op and its DuckDB
  * oracle on boundary events), with the q209 conversion rule folded
  * into the session aggregate itself: entered = the session saw
  * `fromType`; converted = the session's LAST `toType` lies strictly
  * after its FIRST `fromType` — all exact µs integers, so the
  * per-session row is bit-identical to the batch recomputation
  * (StreamingSpec locks this across a mid-session micro-batch
  * split). State is bounded by watermark + gap, never per-user
  * history.
  */
object SessionFunnel {

  def sessionOutcomes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      fromType: String = "signup",
      toType: String = "purchase",
      gap: String = "30 minutes",
      watermark: Option[String] = Some("1 hour")): DataFrame = {
    val marked = events
      .withColumn("__us", unix_micros(col(tsCol)))
    val wm = watermark.fold(marked)(w => marked.withWatermark(tsCol, w))
    wm
      .groupBy(
        col(userCol).as("user_id"),
        session_window(col(tsCol), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        min(when(col(typeCol) === fromType, col("__us"))).as("a_us"),
        max(when(col(typeCol) === toType, col("__us"))).as("b_us"))
      .select(
        col("user_id"),
        timestamp_micros(col("start_us")).as("start_ts"),
        col("n_events"),
        col("a_us").isNotNull.as("entered"),
        (col("a_us").isNotNull && col("b_us").isNotNull &&
          col("b_us") > col("a_us")).as("converted"))
  }
}
