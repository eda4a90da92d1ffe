package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pair-trading analytics: align two series, compute the log-price
  * spread and a trailing-window z-score, and reshape into per-symbol
  * legs with a sign flip on leg 2.
  *
  * Re-expresses the reference's flagship transform
  * (`/root/reference/project/transform_data.py:101-180`):
  *   - exact-timestamp inner join of the two legs (`:121-141`)
  *   - `spread = ln(close1) − ln(close2)` (`:139`)
  *   - rolling 60-row mean/stddev/count, z-score gated at a 30-row
  *     warm-up (`:145-154`, MIN_WINDOW_SIZE=30)
  *   - per-leg reshape with negated spread/z for leg 2 + unionByName
  *     (`:156-180`)
  *
  * Scale notes: the reference partitions the window by `pair_name`
  * alone — one partition per pair, a skew hazard at 100 TB (SURVEY §4).
  * We keep those semantics for parity but parameterize the partition
  * keys so callers can window by (pair, trading_date) when frames don't
  * span days, restoring parallelism. The join is a shuffle-on-bar_ts
  * equi-join; with bars already bucketed per series the two legs
  * partition identically, and AQE converts to broadcast when one leg
  * is small.
  */
object PairAnalytics {

  val DefaultWindowRows = 60
  val DefaultMinWindow = 30

  /** Inner-join two bar series on exact bar timestamp; emit the
    * log-close spread. Expects MarketBars.bars output shape. */
  def pairSpread(bars: DataFrame, sym1: String, sym2: String): DataFrame = {
    val a = bars.filter(col("series") === sym1).alias("a")
    val b = bars.filter(col("series") === sym2).alias("b")
    a.join(b, col("a.bar_ts") === col("b.bar_ts"), "inner")
      .select(
        lit(s"$sym1-$sym2").as("pair_name"),
        col("a.bar_ts").as("bar_ts"),
        col("a.close").as("close1"),
        col("b.close").as("close2"),
        (log(col("a.close")) - log(col("b.close"))).as("spread"))
  }

  /** Trailing-window z-score over the spread, gated on warm-up and a
    * degenerate (zero/null) stddev — NULL, never NaN, in both cases. */
  def rollingZScore(
      spreads: DataFrame,
      windowRows: Int = DefaultWindowRows,
      minWindow: Int = DefaultMinWindow): DataFrame = {
    val w = Window
      .partitionBy(col("pair_name"))
      .orderBy(col("bar_ts"))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    spreads
      .withColumn("rolling_mean", mean(col("spread")).over(w))
      .withColumn("rolling_std", stddev(col("spread")).over(w))
      .withColumn("window_size", count(lit(1)).over(w))
      .withColumn(
        "z_score",
        when(
          col("window_size") >= minWindow &&
            col("rolling_std").isNotNull && col("rolling_std") =!= 0.0,
          (col("spread") - col("rolling_mean")) / col("rolling_std")))
  }

  /** Reshape the pair frame into one row per symbol; leg 2 carries the
    * negated spread/z-score so each symbol has its directional signal
    * (`transform_data.py:176-177`). */
  def legReshape(pair: DataFrame, sym1: String, sym2: String): DataFrame = {
    val common = Seq(col("pair_name"), col("bar_ts"), col("window_size"))
    val leg1 = pair.select(
      lit(sym1).as("symbol") +: common :+
        col("close1").as("close") :+
        col("spread").as("spread") :+
        col("z_score").as("z_score"): _*)
    val leg2 = pair.select(
      lit(sym2).as("symbol") +: common :+
        col("close2").as("close") :+
        (-col("spread")).as("spread") :+
        (-col("z_score")).as("z_score"): _*)
    leg1.unionByName(leg2)
  }

  /** Full flagship chain for one pair over a bar frame. */
  def pairZScore(
      bars: DataFrame,
      sym1: String,
      sym2: String,
      windowRows: Int = DefaultWindowRows,
      minWindow: Int = DefaultMinWindow): DataFrame =
    legReshape(rollingZScore(pairSpread(bars, sym1, sym2), windowRows, minWindow), sym1, sym2)
}
