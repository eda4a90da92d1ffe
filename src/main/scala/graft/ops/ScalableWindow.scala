package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe trailing ROWS windows: partition by (key, day) instead of
  * key alone, with a previous-day carry-in so results are IDENTICAL to
  * the global per-key window.
  *
  * Why: `Window.partitionBy(key)` puts a key's ENTIRE history in one
  * task — the skew hazard SURVEY §7.4 flags for the reference's
  * pair-window (`transform_data.py:145-154`) and for q49-class event
  * windows. At 100 TB a hot key serializes on one core and can exceed
  * task memory. Scoping the partition to (key, day) restores
  * parallelism ∝ days; the frame still sees the true trailing history
  * because each day's partition is prepended with a copy of the
  * previous day's last `carryRows` rows (flagged non-emitting).
  *
  * Equivalence condition (checked by [[validateCarry]], property-tested
  * in PropertySpec): a trailing frame of `w` rows never reaches past
  * the previous day, i.e. every day that HAS an earlier day carries at
  * least `w − 1` rows. Frame contents and their order are then
  * identical to the global window's for every emitted row, so
  * aggregates are bit-identical (same fold over the same buffer).
  *
  * Scale posture: the day-index map is a per-key distinct-day frame
  * (keys × days rows — broadcast); carry selection is one row_number
  * window over the SAME (key, day) partitioning the stats use; no
  * per-key global sort ever happens.
  */
object ScalableWindow {

  /** Augment `df` with `__day_idx` (dense per-key day rank) and
    * `__emit`, unioning in non-emitting copies of each (key, day)'s
    * last `carryRows` rows tagged to the NEXT day index. Build the
    * stats window as `partitionBy(keyCols :+ "__day_idx")` ordered by
    * `orderCols`, then `filter(col("__emit"))` and drop the helpers.
    *
    * `orderCols` must totally order rows within a key (add a
    * tie-breaker id when the timestamp can repeat) — the carried tail
    * is selected by the same order reversed.
    */
  def dayScoped(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      carryRows: Int): DataFrame = {
    require(carryRows >= 1, s"carryRows must be >= 1 (got $carryRows)")
    val keys = keyCols.map(col)
    val days = df.select(keys :+ to_date(col(tsCol)).as("__day"): _*).distinct()
    val idxW = Window.partitionBy(keys: _*).orderBy(col("__day"))
    val dayIdx = days.withColumn("__day_idx", row_number().over(idxW))
    val withIdx = df.withColumn("__day", to_date(col(tsCol)))
      .join(broadcast(dayIdx), keyCols :+ "__day")
    val tailW = Window
      .partitionBy((keys :+ col("__day_idx")): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val carried = withIdx
      .withColumn("__rn", row_number().over(tailW))
      .filter(col("__rn") <= carryRows)
      .drop("__rn")
      .withColumn("__day_idx", col("__day_idx") + 1)
      .withColumn("__emit", lit(false))
    withIdx.withColumn("__emit", lit(true)).unionByName(carried)
  }

  /** Runtime check of the equivalence condition: every (key, day) with
    * an earlier day present must hold at least `carryRows` rows.
    * Returns the number of violating (key, day) slices (0 = the
    * day-scoped window is exactly the global window). One aggregate
    * job over the (key, day) counts — call it when ingesting a NEW
    * data shape, not per query. */
  def validateCarry(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      carryRows: Int): Long = {
    val keys = keyCols.map(col)
    val counts = df.groupBy(keys :+ to_date(col(tsCol)).as("__day"): _*)
      .agg(count(lit(1)).as("__n"))
    val idxW = Window.partitionBy(keys: _*).orderBy(col("__day"))
    counts.withColumn("__i", row_number().over(idxW))
      .filter(col("__i") > 1 && col("__n") < carryRows)
      .count()
  }

  /** Day-scoped twin of [[PairAnalytics.rollingZScore]] — identical
    * output (same columns, same doubles) with (pair, day) task
    * granularity. */
  def rollingZScoreByDay(
      spreads: DataFrame,
      windowRows: Int = PairAnalytics.DefaultWindowRows,
      minWindow: Int = PairAnalytics.DefaultMinWindow): DataFrame = {
    val aug = dayScoped(spreads, Seq("pair_name"), Seq("bar_ts"), "bar_ts", windowRows - 1)
    val w = Window
      .partitionBy(col("pair_name"), col("__day_idx"))
      .orderBy(col("bar_ts"))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    aug
      .withColumn("rolling_mean", mean(col("spread")).over(w))
      .withColumn("rolling_std", stddev(col("spread")).over(w))
      .withColumn("window_size", count(lit(1)).over(w))
      .withColumn(
        "z_score",
        when(
          col("window_size") >= minWindow &&
            col("rolling_std").isNotNull && col("rolling_std") =!= 0.0,
          (col("spread") - col("rolling_mean")) / col("rolling_std")))
      .filter(col("__emit"))
      .drop("__emit", "__day", "__day_idx")
  }

  /** Generic day-scoped trailing stats used by the q76 oracle twin:
    * per-key rolling mean / sample-stddev / count of `valCol` over the
    * last `w` rows ordered by `orderCols`.
    *
    * The frame reductions run in DECIMAL (exact, order-insensitive) and
    * mean/stddev derive from the exact sums with scalar double math —
    * a double `avg(...) OVER frame` differs between engines in the last
    * ulp (different frame-combine orders: fold vs segment tree) and a
    * boundary value then rounds differently (observed: one row in 10k).
    * The value itself is first cast to DECIMAL(18,6) so its square
    * stays inside exact decimal range in both engines. */
  def trailingStats(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      tsCol: String,
      valCol: String,
      w: Int): DataFrame = {
    val aug = dayScoped(df, keyCols, orderCols, tsCol, w - 1)
    val win = Window
      .partitionBy((keyCols.map(col) :+ col("__day_idx")): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(w - 1), Window.currentRow)
    val dv = col(valCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
    // all three frame reductions in ONE projection so they share a
    // single Window operator (chained withColumns stacked three)
    val s1 = col("__s1")
    val s2 = col("__s2")
    val n = col("n_win")
    aug
      .select(col("*"),
        sum(dv).over(win).cast("double").as("__s1"),
        sum(dv * dv).over(win).cast("double").as("__s2"),
        count(lit(1)).over(win).as("n_win"))
      .withColumn("r_mean", round(s1 / n, 6))
      .withColumn("r_std",
        when(n > 1,
          round(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), lit(0.0))), 6)))
      .filter(col("__emit"))
      .drop("__emit", "__day", "__day_idx", "__s1", "__s2")
  }
}
