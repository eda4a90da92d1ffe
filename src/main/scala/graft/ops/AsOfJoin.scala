package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the nearest right row at or
  * before ([[backward]]) / at or after ([[forward]]) the left
  * timestamp, within matching partition keys.
  *
  * This is the operator a production pair-alignment pipeline uses
  * where the reference settles for exact-equality inner join + a
  * separate gap audit (SURVEY §2.3 note on J1,
  * `/root/reference/project/transform_data.py:121-141`).
  *
  * Spark has no native as-of join, and the naive range-join
  * formulation (`l JOIN r ON r.ts <= l.ts`, then max) explodes to
  * O(|l|·|r|) pairs per key. This implementation is the scalable
  * union-window form: tag both sides, union, and carry the last
  * non-null right value forward with one window pass — one shuffle on
  * the partition keys, O(n log n) per key, no pair explosion. At
  * 100 TB the partition keys (symbol, day) bound every window to one
  * session's rows.
  *
  * Ties (right.ts == left.ts) match, like DuckDB/kdb ASOF semantics:
  * the right side sorts before the left at equal timestamps.
  *
  * Staleness tolerance (kdb `wj`/pandas `tolerance=`) composes on
  * top rather than needing a variant: carry the quote's own
  * timestamp as an extra carry column and null-out matches older
  * than the budget afterwards (q94 does exactly this — the carry
  * machinery is unchanged, the tolerance is one post-window
  * predicate).
  */
object AsOfJoin {

  /** @param left      probe rows (all columns preserved)
    * @param right     quote rows: must contain partitionCols, tsCol
    *                  and carryCols ONLY, with at most one row per
    *                  (partitionCols, tsCol) — pre-aggregate if not
    * @param partitionCols equality keys (e.g. symbol, trading day)
    * @param tsCol     ordering column (same name both sides)
    * @param carryCols right columns to attach to each left row */
  def backward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      carryCols: Seq[String]): DataFrame =
    joined(left, right, partitionCols, tsCol, carryCols, fwd = false)

  /** Forward as-of: attach the EARLIEST right row whose timestamp is
    * >= the left timestamp (equal timestamps match). Same union-window
    * mechanics as [[backward]], traversed in descending time order. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      carryCols: Seq[String]): DataFrame =
    joined(left, right, partitionCols, tsCol, carryCols, fwd = true)

  private def joined(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      carryCols: Seq[String],
      fwd: Boolean): DataFrame = {
    val leftOnly = left.columns.filterNot(c => partitionCols.contains(c) || c == tsCol).toSeq
    val keyCols = (partitionCols :+ tsCol).map(col)
    val lCols = keyCols ++ leftOnly.map(col) ++ Seq(lit(1).as("__side")) ++
      carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__carry_$c"))
    val rCols = keyCols ++
      leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(lit(0).as("__side")) ++
      carryCols.map(c => col(c).as(s"__carry_$c"))
    val l = left.select(lCols: _*)
    val r = right.select(rCols: _*)

    // backward walks time ascending (carry the latest past quote);
    // forward walks descending (carry the nearest future quote). The
    // right side sorts first at equal timestamps either way, so ties
    // match in both directions.
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(if (fwd) col(tsCol).desc else col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = carryCols.foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(c, last(col(s"__carry_$c"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .drop("__side" +: carryCols.map(c => s"__carry_$c"): _*)
  }
}
