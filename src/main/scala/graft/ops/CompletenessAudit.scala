package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missing-bar audit: enumerate every (symbol, expected slot) the
  * actual data lacks — `/root/reference/audit_pipeline.py:168-201`
  * re-expressed as one declarative plan.
  *
  * Shape at scale: the expected grid is (sessions × 78 slots) ×
  * symbols — both dims small relative to actuals, so the symbols side
  * is broadcast into the cross join (the reference hints this too,
  * `audit_pipeline.py:186`) and the anti-join shuffles only on
  * (symbol, timestamp), the natural key the actuals are already
  * bucketed by when the lake is laid out sensibly.
  */
object CompletenessAudit {

  /** @param calendar sessions frame (MarketCalendar shape)
    * @param actuals  bar rows with symbol + timestamp columns */
  def missingBars(
      calendar: DataFrame,
      actuals: DataFrame,
      symbolCol: String = "symbol",
      tsCol: String = "timestamp"): DataFrame = {
    val grid = MarketCalendar.slotGrid(calendar)
    val symbols = actuals.select(col(symbolCol).as("symbol")).distinct()
    val expected = grid.crossJoin(broadcast(symbols))
    val present = actuals
      .where(col(symbolCol).isNotNull && col(tsCol).isNotNull)
      .select(col(symbolCol).as("symbol"), col(tsCol).as("slot_utc"))
    expected
      .join(present, Seq("symbol", "slot_utc"), "left_anti")
      .select(col("symbol"), col("slot_utc").as("timestamp"),
        to_date(col("slot_utc")).as("trading_date"))
      .orderBy(col("timestamp"), col("symbol"))
  }
}
