package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the incremental twin of the batch
  * gaps-and-islands query (q56): per-user activity sessions that split
  * at an inactivity gap.
  *
  * `session_window` keeps one open window per (user, session) in the
  * state store, extending it while events keep arriving within `gap`
  * of the session's current end; the watermark closes sessions whose
  * extension horizon has passed, so state is bounded by
  * watermark + gap — no unbounded per-user history.
  *
  * Merge rule is STRICT: an event exactly `gap` after the session's
  * last event starts a NEW session (the window is [start, last+gap)).
  * The batch twin (q56), its DuckDB oracle, and StreamingSpec's batch
  * comparator all break on the same strict `diff >= gap` rule, so the
  * three definitions of a session agree even for events landing
  * exactly on the gap boundary.
  */
object Sessionizer {

  def userSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: Option[String] = Some("1 hour")): DataFrame = {
    val marked = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    marked
      .groupBy(
        col(userCol).as("user_id"),
        session_window(col(tsCol), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
      .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"))
  }
}
