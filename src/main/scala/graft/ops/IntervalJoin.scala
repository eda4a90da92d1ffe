package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range ("interval containment") join rewritten as an equi-join on
  * fixed-width time bins.
  *
  * A containment join `l.ts >= r.t0 AND l.ts < r.t1` has no equality
  * predicate, so Spark plans BroadcastNestedLoopJoin (acceptable only
  * while one side broadcasts) or a cartesian product (never
  * acceptable). The bin rewrite restores a shuffle-able equi-key:
  *
  *  - every interval explodes into the fixed-width bins it overlaps;
  *  - every point row maps to its single containing bin;
  *  - the join runs as a hash equi-join on `bin`;
  *  - the exact containment predicate filters within the bin.
  *
  * With `binMicros` at least the longest interval length, each
  * interval lands in at most 2 bins, so the interval-side blow-up is
  * bounded by 2x regardless of data volume. Both sides stay
  * hash-partitioned on the bin key — the plan is an ordinary shuffled
  * (or broadcast, when the exploded interval side is small) hash join
  * that scales horizontally, where the nested-loop formulation would
  * pin the whole point side against every interval.
  *
  * Each (point, interval) output pair emerges at most once: the point
  * row's bin is unique, so no post-join distinct is needed.
  */
object IntervalJoin {

  /** Join `points` (event rows carrying `tsCol`) to `intervals`
    * (carrying half-open [`t0Col`, `t1Col`) bounds) on containment.
    * Output columns: all of `points` plus all of `intervals`.
    *
    * Intervals with `t1 <= t0` are empty and dropped up front —
    * `sequence(a, b)` counts DOWN when b < a (the q25 shingle
    * pitfall), which would fabricate phantom bins.
    */
  def binnedContainmentJoin(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      t0Col: String,
      t1Col: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val binned = intervals
      .filter(col(t1Col) > col(t0Col))
      .withColumn("__bin", explode(sequence(
        floor(unix_micros(col(t0Col)) / binMicros).cast("long"),
        floor((unix_micros(col(t1Col)) - 1) / binMicros).cast("long"))))
    points
      .withColumn("__bin",
        floor(unix_micros(col(tsCol)) / binMicros).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(tsCol) >= col(t0Col) && col(tsCol) < col(t1Col))
      .drop("__bin")
  }
}
