package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar sessions and the expected 5-minute bar grid.
  *
  * The reference fetches `{date, open, close}` sessions from the
  * vendor calendar API and builds per-session UTC bounds driver-side
  * with zoneinfo (`/root/reference/audit_pipeline.py:50-70,123-160`);
  * here sessions are a small DataFrame (S4/S5 — from a REST fetch, a
  * fixture file, or inline rows) and the ET→UTC conversion + grid
  * expansion run as Column expressions, so the grid generation itself
  * distributes and the sessions dim stays broadcast-small.
  */
object MarketCalendar {

  case class Session(date: String, open: String, close: String)

  /** Inline sessions → DataFrame (explicit schema, like
    * `audit_pipeline.py:154-160`). */
  def sessionsDF(spark: SparkSession, sessions: Seq[Session]): DataFrame = {
    import spark.implicits._
    sessions.toDF("date", "open", "close")
  }

  /** Add DST-safe UTC session bounds + last-bar timestamp
    * (`audit_pipeline.py:132-152`: last bar starts close − 5min). */
  def withUtcBounds(cal: DataFrame): DataFrame =
    cal
      .withColumn("open_utc",
        to_utc_timestamp(
          to_timestamp(concat_ws(" ", col("date"), col("open")), "yyyy-MM-dd HH:mm"),
          "America/New_York"))
      .withColumn("close_utc",
        to_utc_timestamp(
          to_timestamp(concat_ws(" ", col("date"), col("close")), "yyyy-MM-dd HH:mm"),
          "America/New_York"))
      .withColumn("last_bar_utc", col("close_utc") - expr("INTERVAL 5 MINUTES"))

  /** Expected per-session 5-minute slot grid
    * (`audit_pipeline.py:168-181`): one row per (date, slot). */
  def slotGrid(cal: DataFrame): DataFrame =
    withUtcBounds(cal).select(
      col("date"),
      explode(expr("sequence(open_utc, last_bar_utc, INTERVAL 5 MINUTES)")).as("slot_utc"))

  /** Expected bars, calendar variant: (close − open) / 5, NO +1 —
    * `validate_calendar_alpaca.py:44-55`. */
  def expectedBarsCalendar(cal: DataFrame): DataFrame =
    withUtcBounds(cal).withColumn("expected_bars",
      ((unix_timestamp(col("close_utc")) - unix_timestamp(col("open_utc"))) / 300L)
        .cast("int"))

  /** Expected bars, dynamic variant from observed min/max timestamps:
    * whole observed minutes first (`validate_data.py:122` floors the
    * span to minutes BEFORE the bar division), then the inclusive
    * ceil-div — ceil(minutes/barMinutes) + 1 (`validate_data.py:124`).
    * The two validators disagree by one bar on early-close days BY
    * DESIGN (SURVEY appendix); both are preserved. */
  def expectedBarsDynamic(
      minTs: org.apache.spark.sql.Column,
      maxTs: org.apache.spark.sql.Column,
      barMinutes: Int = 5): org.apache.spark.sql.Column = {
    val minutes = floor((unix_micros(maxTs) - unix_micros(minTs)) / lit(60000000L))
    (ceil(minutes / lit(barMinutes.toDouble)) + 1).cast("int")
  }
}
