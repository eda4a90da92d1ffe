package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-modeling operators the reference's Postgres layer gets
  * from hand-written SQL; here they are engine operators.
  *
  * The reference persists run-stamped snapshots
  * (`validate_calendar_alpaca.py:104-129` inserts keyed detail rows and
  * lets history accumulate); the natural next step for any consumer of
  * that history is a slowly-changing-dimension view — "what was this
  * key's attribute over time, as validity intervals". [[scd2]] builds
  * exactly that from an append-only snapshot/event log.
  */
object WarehouseOps {

  /** Slowly-changing-dimension Type 2 build: collapse an append-only
    * snapshot log (key, ts, attribute) into attribute validity
    * intervals — one row per attribute CHANGE with `effective_from`,
    * `effective_to` (null while current), a per-key `version`, and an
    * `is_current` flag.
    *
    * Change detection is a lag over (ts, tie) within the key;
    * consecutive equal attribute values collapse (the q136 islands
    * rule, producing intervals instead of run stats). `tieCol` makes
    * same-timestamp snapshots deterministic: the later tie wins the
    * interval, the earlier one closes at zero length — identical
    * total order in both engines.
    *
    * Scale: both window passes share ONE partitioning/ordering
    * (partition by key, order by ts, tie), so Catalyst plans a single
    * exchange + sort reused across the lag, row_number, and lead —
    * per-key history is bounded by change count, not log size, after
    * the first filter. The key cardinality grows with data; no hot
    * partitions.
    */
  def scd2(
      snapshots: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    snapshots
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol),
        col("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** The standing per-(day, key) rollup [[incrementalDailyAgg]]
    * maintains: exact counts plus a DECIMAL-accumulated value sum
    * emitted as a 6dp double. */
  def dailyAgg(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    events.groupBy(to_date(col(tsCol)).as("d"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valCol).cast(DecimalType(18, 6)))
          .cast(DoubleType), 6).as("sum_value"))
  }

  /** Incremental refresh of a standing daily aggregate under LATE
    * data: recompute ONLY the days the delta batch touches (from the
    * full source, so multiple late batches stay idempotent) and splice
    * them over the base — the partition-scoped "backfill just what
    * changed" pattern every warehouse pipeline runs nightly, instead
    * of the reference's full-refresh (`ingest_data.py` rewrites whole
    * tables).
    *
    * Correctness contract: the result equals [[dailyAgg]] over the
    * full source exactly (days without late rows are untouched base
    * rows; days with late rows are recomputed whole). The affected-day
    * sliver BROADCASTS into both branches — an anti join keeps the
    * untouched base rows, a semi join prunes the recompute scan to the
    * affected days BEFORE any aggregation, so the refresh costs
    * O(affected partitions), not O(table). */
  def incrementalDailyAgg(
      baseAgg: DataFrame,
      fullSource: DataFrame,
      delta: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    val affected = delta.select(to_date(col(tsCol)).as("ad")).distinct()
    val kept = baseAgg.join(broadcast(affected),
      col("d") === col("ad"), "left_anti")
    val recomputed = dailyAgg(
      fullSource.join(broadcast(affected),
        to_date(col(tsCol)) === col("ad"), "left_semi"),
      keyCol, tsCol, valCol)
    kept.unionByName(recomputed)
  }
}
