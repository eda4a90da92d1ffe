package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-load data-quality reports — the reference's two validators
  * re-expressed as DataFrame ops instead of driver-side Python loops:
  *
  *   - [[classify]] / [[runSummary]]: per-symbol completeness with
  *     OK/WARN/FAIL thresholds (`/root/reference/project/
  *     validate_data.py:138-216`);
  *   - [[calendarClassify]]: calendar-aware PASS/FAIL/WARN with
  *     too-many-bars (extended-hours leak) detection and early-close
  *     annotation (`/root/reference/validate_calendar_alpaca.py:
  *     181-249`).
  *
  * Both are pure aggregations + a broadcast calendar join — no
  * collect() loops, so they run at any scale.
  */
object QualityReport {

  /** WARN up to this many missing bars, FAIL above
    * (`validate_data.py:13`, FAIL_MISSING_BARS_GT=2). */
  val FailMissingBarsGt = 2

  /** Calendar tolerance in bars (`validate_calendar_alpaca.py:13`). */
  val ToleranceBars = 2

  /** Bars per full 5-min session (`validate_data.py:9-10`). */
  val ExpectedBarsFull = 78

  /** Per-(symbol, trading day) bar counts. */
  def symbolDayCounts(bars: DataFrame, symbolCol: String = "symbol", tsCol: String = "timestamp"): DataFrame =
    bars.groupBy(col(symbolCol).as("symbol"), to_date(col(tsCol)).as("trading_date"))
      .agg(count(lit(1)).as("actual_bars"))

  /** OK/WARN/FAIL per symbol-day: missing = max(0, expected − actual);
    * 0 → OK, ≤ threshold → WARN, else FAIL
    * (`validate_data.py:153,170-191`). */
  def classify(counts: DataFrame, expectedBars: Int = ExpectedBarsFull): DataFrame =
    counts
      .withColumn("expected_bars", lit(expectedBars))
      .withColumn("missing_bars", greatest(lit(0L), lit(expectedBars.toLong) - col("actual_bars")))
      .withColumn("status",
        when(col("missing_bars") === 0, "OK")
          .when(col("missing_bars") <= FailMissingBarsGt, "WARN")
          .otherwise("FAIL"))
      .withColumn("notes",
        when(col("missing_bars") === 0, lit("complete"))
          .otherwise(format_string("Missing %d bars", col("missing_bars"))))

  /** Run rollup: totals + overall badge
    * (`validate_data.py:194-216`). */
  def runSummary(classified: DataFrame): DataFrame =
    classified.agg(
      count(lit(1)).as("symbols_total"),
      sum(when(col("status") === "OK", 1L).otherwise(0L)).as("symbols_ok"),
      sum(when(col("status") === "WARN", 1L).otherwise(0L)).as("symbols_warn"),
      sum(when(col("status") === "FAIL", 1L).otherwise(0L)).as("symbols_fail"),
      max(col("missing_bars")).as("max_missing"))
      .withColumn("overall_status",
        when(col("symbols_fail") > 0, "FAIL")
          .when(col("symbols_warn") > 0, "WARN")
          .otherwise("OK"))

  /** Calendar-aware classifier (`validate_calendar_alpaca.py:203-245`):
    *   - day not in the calendar → WARN "unexpected trading day";
    *   - actual < expected − tolerance → FAIL (missing bars);
    *   - actual > expected → FAIL (extended hours leaked);
    *   - otherwise PASS; early-close days annotated.
    * `expected = (close − open)/5` with NO +1 — the deliberate
    * off-by-one vs the dynamic validator (SURVEY appendix). */
  def calendarClassify(counts: DataFrame, calendar: DataFrame): DataFrame = {
    val cal = MarketCalendar.expectedBarsCalendar(calendar)
      .select(col("date"), col("open").as("session_open_et"),
        col("close").as("session_close_et"), col("expected_bars"))
    counts
      .join(broadcast(cal), counts("trading_date") === to_date(cal("date")), "left")
      .drop("date")
      .withColumn("status",
        when(col("expected_bars").isNull, "WARN")
          .when(col("actual_bars") < col("expected_bars") - ToleranceBars, "FAIL")
          .when(col("actual_bars") > col("expected_bars"), "FAIL")
          .otherwise("PASS"))
      .withColumn("notes",
        when(col("expected_bars").isNull, lit("not in calendar (unexpected trading day)"))
          .otherwise(concat(
            when(col("actual_bars") < col("expected_bars") - ToleranceBars,
              lit("missing bars (feed gap or filter issue)"))
              .when(col("actual_bars") > col("expected_bars"),
                lit("too many bars (extended hours leaked)"))
              .otherwise(lit("full/near-full")),
            when(col("expected_bars") < ExpectedBarsFull,
              concat(lit(" | early close ("), col("session_open_et"), lit("-"),
                col("session_close_et"), lit(" ET)")))
              .otherwise(lit("")))))
  }
}
