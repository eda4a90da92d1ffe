package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's SERVING path re-expressed on the lake layout — the
  * dashboard query set of `/root/reference/app.py` (`load_symbols`
  * :26, `load_symbol_data` :33-47, tail preview :52-55) reading an
  * engine-written layout instead of a Postgres serving table.
  *
  * Layout contract ([[writeServing]]): hive-partitioned by symbol,
  * each partition's files sorted by bar timestamp. Then:
  *   - the symbol-equality predicate prunes whole DIRECTORIES
  *     (partition pruning — the scan's PartitionFilters);
  *   - the timestamp range prunes FILES and row groups inside the
  *     surviving partition via parquet min/max stats (PushedFilters),
  *     because the sort makes each file cover a narrow ts span;
  *   - the tail preview is a TakeOrderedAndProject over the pruned
  *     scan — never a full sort.
  *
  * ScaleSpec locks all three: the scan's numFiles metric must drop to
  * the one-symbol slice, and the pushed/partition filters must appear
  * in the executed plan. At 100 TB this layout serves the dashboard's
  * (symbol, range) access pattern from cold parquet with per-query
  * I/O proportional to the answer, not the table.
  */
object ServingQueries {

  /** Write bars (series, bar_ts, ...) as the serving layout:
    * directory per symbol, ts-sorted files inside each. `nSlices`
    * range-slices the (series, ts) space, so every file covers a
    * narrow ts span of one symbol (at 100 TB: total bytes / target
    * file size). */
  def writeServing(bars: DataFrame, path: String, nSlices: Int = 8): Unit =
    bars
      .repartitionByRange(nSlices, col("series"), col("bar_ts"))
      .sortWithinPartitions(col("series"), col("bar_ts"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("series")
      .parquet(path)

  /** `SELECT DISTINCT symbol ORDER BY symbol` (app.py:26) — resolved
    * from partition DIRECTORIES; no data file is opened. */
  def symbols(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("series")).distinct().orderBy(col("series"))

  /** `WHERE symbol = ? [AND ts >= ?] [AND ts <= ?] ORDER BY ts`
    * (app.py:33-47) — partition-pruned to one directory, file/row-
    * group-pruned by the ts stats. */
  def symbolRange(
      spark: SparkSession,
      path: String,
      symbol: String,
      startTs: Option[String] = None,
      endTs: Option[String] = None): DataFrame = {
    val base = spark.read.parquet(path).filter(col("series") === symbol)
    val lo = startTs.fold(base)(t => base.filter(col("bar_ts") >= lit(t).cast("timestamp")))
    val hi = endTs.fold(lo)(t => lo.filter(col("bar_ts") <= lit(t).cast("timestamp")))
    hi.orderBy(col("bar_ts"))
  }

  /** Latest-n preview for one symbol (the dashboard tail, app.py's
    * `df.tail(20)` server-side) — TakeOrderedAndProject, not a sort. */
  def tailPreview(
      spark: SparkSession,
      path: String,
      symbol: String,
      n: Int = 20): DataFrame =
    spark.read.parquet(path)
      .filter(col("series") === symbol)
      .orderBy(col("bar_ts").desc)
      .limit(n)
}
