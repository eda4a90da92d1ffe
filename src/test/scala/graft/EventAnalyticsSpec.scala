package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventAnalytics

/** Handcrafted-fixture tests for the event-analytics operators:
  * expected outputs computed by hand, not by re-running the engine's
  * own formula.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillLocf fills empty minutes with the last observed mean") {
    val ev = Seq(
      // minute 00:00 has two obs (mean 2.0), 00:01-00:02 empty, 00:03 one
      (1L, ts("2024-01-01 00:00:10"), 7L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 00:00:40"), 7L, "a", 3.0, "{}"),
      (3L, ts("2024-01-01 00:03:30"), 7L, "a", 5.0, "{}"),
      (4L, ts("2024-01-01 00:00:05"), 8L, "b", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.gapFillLocf(ev)
      .orderBy("event_type", "minute")
      .select("event_type", "n_obs", "value_locf", "is_filled")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out === Seq(
      ("a", 2L, 2.0, false),
      ("a", 0L, 2.0, true),
      ("a", 0L, 2.0, true),
      ("a", 1L, 5.0, false),
      ("b", 1L, 9.0, false)))
  }

  test("robustOutliers finds the hand-computed median/MAD outlier") {
    // values 1..9 + 100: med = 5.5, devs sorted
    // [.5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5] -> MAD = 2.5,
    // threshold 7.5 -> exactly the 100 is out
    val ev = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, ts("2024-01-01 00:00:01"), 1L, "a", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.robustOutliers(ev, k = 3.0).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("med") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("outlier_ratio") === 0.1)
  }

  test("candlePatterns: each rule fires on its handcrafted bar") {
    val bars = Seq(
      // plain red bar: nothing fires
      ("s", ts("2024-01-01 00:00:00"), 10.0, 10.2, 9.0, 9.1),
      // green body engulfing the previous red body
      ("s", ts("2024-01-01 00:05:00"), 9.0, 10.1, 8.9, 10.05),
      // tiny body vs range
      ("s", ts("2024-01-01 00:10:00"), 10.0, 10.5, 9.6, 10.01),
      // body ~ whole range
      ("s", ts("2024-01-01 00:15:00"), 10.0, 11.02, 9.99, 11.0),
      // long lower wick, tiny upper
      ("s", ts("2024-01-01 00:20:00"), 10.9, 11.02, 10.5, 11.0),
      // long upper wick, tiny lower
      ("s", ts("2024-01-01 00:25:00"), 10.5, 10.9, 10.38, 10.4))
      .toDF("series", "bar_ts", "open", "high", "low", "close")
    val out = graft.ops.MarketBars.candlePatterns(bars)
      .orderBy("bar_ts").collect().map(_.getAs[String]("pattern"))
    assert(out === Seq("none", "bull_engulf", "doji", "marubozu",
      "hammer", "shooting_star"))
  }

  test("amihudIlliquidity: hand-computed |ret|/volume day mean") {
    val bars = Seq(
      ("s", ts("2024-01-01 00:00:00"), 100.0, 10.0),
      ("s", ts("2024-01-01 00:05:00"), 102.0, 50.0),
      ("s", ts("2024-01-01 00:10:00"), 101.0, 100.0))
      .toDF("series", "bar_ts", "close", "volume")
    val r = graft.ops.MarketBars.amihudIlliquidity(bars).collect().head
    assert(r.getAs[Long]("n_rets") === 2L)
    // mirror the engine arithmetic exactly: 1e6-scaled terms rounded
    // 12dp, decimal-summed, mean rounded 6dp (~249.02)
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val t1 = r12(1e6 * math.abs(102.0 / 100.0 - 1) / 50.0)
    val t2 = r12(1e6 * math.abs(101.0 / 102.0 - 1) / 100.0)
    val expected = BigDecimal((t1 + t2).toDouble / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(expected - 249.0196) < 0.001)
    assert(r.getAs[Double]("amihud") === expected)
  }

  test("seasonalBaseline: hand-computed cell means and seasonal index") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-02 00:20:00"), 2L, "a", 3.0, "{}"),
      (3L, ts("2024-01-01 01:10:00"), 1L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.seasonalBaseline(ev)
      .orderBy("event_type", "hr").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // hour 0: mean (1+3)/2 = 2; hour 1: 4; overall 8/3 -> idx .75 / 1.5
    assert(out === Seq((0, 2L, 2.0, 0.75), (1, 1L, 4.0, 1.5)))
  }

  test("ccf: delayed copy peaks at exactly +1 lag") {
    val pair = (2 to 21).map { t =>
      ("p", ts(f"2024-01-01 00:$t%02d:00"),
        (t * t).toDouble, ((t - 1) * (t - 1)).toDouble)
    }.toDF("pair_name", "bar_ts", "close1", "close2")
    val out = graft.ops.PairAnalytics.ccf(pair, maxLag = 2)
      .collect()
      .map(r => r.getAs[Int]("k") -> (r.getAs[Long]("n"), r.getAs[Double]("r_ccf")))
      .toMap
    assert(out.size === 5)
    // close2 is close1 delayed one bar: lead(close2, 1) == close1 exactly
    assert(out(1)._1 === 19L)
    assert(out(1)._2 === 1.0)
    assert(Seq(-2, -1, 0, 2).forall(k => out(k)._2 < 1.0 && out(k)._2 > 0.9))
  }

  test("transitions: hand-computed counts, row-normalized p, dest-value mean") {
    val ev = Seq(
      // u1: a -> b -> a ; u2: a -> a -> b
      (1L, ts("2024-01-01 00:00:01"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 00:00:02"), 1L, "b", 2.0, "{}"),
      (3L, ts("2024-01-01 00:00:03"), 1L, "a", 3.0, "{}"),
      (4L, ts("2024-01-01 00:00:01"), 2L, "a", 4.0, "{}"),
      (5L, ts("2024-01-01 00:00:02"), 2L, "a", 5.0, "{}"),
      (6L, ts("2024-01-01 00:00:03"), 2L, "b", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.transitions(ev)
      .orderBy("prev_type", "next_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // edges: (a,a) n=1 dest 5.0; (a,b) n=2 dest {2.0, 6.0}; (b,a) n=1 dest 3.0
    assert(out === Seq(
      ("a", "a", 1L, 0.333333, 5.0),
      ("a", "b", 2L, 0.666667, 4.0),
      ("b", "a", 1L, 1.0, 3.0)))
  }

  test("funnel counts survivors per step with the 60-min window") {
    val t0 = "2024-01-01 10:00:00"
    val ev = Seq(
      // u1 completes all three steps inside the windows
      (1L, ts(t0), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:30:00"), 1L, "purchase", 1.0, "{}"),
      // u2's click is 90 min after the view — outside the window
      (4L, ts(t0), 2L, "view", 1.0, "{}"),
      (5L, ts("2024-01-01 11:30:00"), 2L, "click", 1.0, "{}"),
      // u3 clicks in-window, purchases 70 min later — out
      (6L, ts(t0), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 10:05:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-01-01 11:15:00"), 3L, "purchase", 1.0, "{}"),
      // u4 never views — not in the funnel at all
      (9L, ts(t0), 4L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics
      .funnel(ev, Seq("view", "click", "purchase"), windowMinutes = 60)
      .orderBy("step")
      .collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[Long]("n_users"),
        r.getAs[Double]("conv_from_first")))
    assert(out === Seq((1, 3L, 1.0), (2, 2L, 0.6667), (3, 1L, 0.3333)))
  }

  test("retention counts distinct users per (cohort, offset) cell") {
    def e(id: Long, day: Int, u: Long) =
      (id, ts(f"2024-01-${day + 1}%02d 12:00:00"), u, "view", 1.0, "{}")
    val ev = Seq(
      e(1, 0, 1), e(2, 1, 1), e(3, 3, 1), // u1 cohort day0, back on 1 and 3
      e(4, 1, 2), e(5, 3, 2), // u2 cohort day1, back on 3 (offset 2)
      e(6, 1, 2)) // same-day dup for u2 — must not double count
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.retention(ev)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("day_offset"), r.getAs[Long]("n_users")))
    assert(out === Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 2, 1L)))
  }

  test("drawdown tracks the running peak and the deepest drop") {
    // path 10, 8, 12, 6, 9 -> peaks 10,10,12,12,12
    // drawdowns 0,-2,0,-6,-3 -> max_dd -6, pct -6/12 = -0.5
    val ev = Seq(10.0, 8.0, 12.0, 6.0, 9.0).zipWithIndex.map {
      case (v, i) =>
        (i.toLong, ts(f"2024-01-01 00:0$i:00"), 1L, "a", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.drawdown(ev).collect().head
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("peak_value") === 12.0)
    assert(r.getAs[Double]("max_drawdown") === -6.0)
    assert(r.getAs[Double]("max_drawdown_pct") === -0.5)
  }

  test("binnedContainmentJoin matches the containment semantics, " +
    "drops empty intervals, and emits each pair once") {
    val pts = Seq(
      (1L, ts("2024-01-01 00:00:30")),
      (2L, ts("2024-01-01 00:04:00")),
      (3L, ts("2024-01-01 00:10:00")))
      .toDF("pid", "t")
    val ivs = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")),
      // spans three 5-min bins — must still match each point once
      (20L, ts("2024-01-01 00:04:00"), ts("2024-01-01 00:12:00")),
      // empty (t1 == t0) — must vanish, not fabricate descending bins
      (30L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:20:00")))
      .toDF("iid", "t0", "t1")
    val out = graft.ops.IntervalJoin
      .binnedContainmentJoin(pts, "t", ivs, "t0", "t1",
        binMicros = 5L * 60 * 1000000)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out === Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("rollingCorr: exact +1/-1 on linear legs, null on warm-up " +
    "and degenerate variance") {
    def t(i: Int) = ts(f"2024-01-01 00:0$i:00")
    val pair = Seq(
      ("p", t(0), 1.0, 2.0), ("p", t(1), 2.0, 4.0),
      ("p", t(2), 3.0, 6.0), ("p", t(3), 4.0, 8.0),
      // anti-correlated pair, separate key
      ("q", t(0), 1.0, 9.0), ("q", t(1), 2.0, 7.0), ("q", t(2), 3.0, 5.0),
      // degenerate: constant right leg
      ("r", t(0), 1.0, 5.0), ("r", t(1), 2.0, 5.0), ("r", t(2), 3.0, 5.0))
      .toDF("pair_name", "bar_ts", "close1", "close2")
    val out = graft.ops.PairAnalytics.rollingCorr(pair, nBars = 3)
      .orderBy("pair_name", "bar_ts").collect()
      .map(r => (r.getAs[String]("pair_name"),
        Option(r.getAs[java.lang.Double]("r_corr")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      ("p", None), ("p", None), ("p", Some(1.0)), ("p", Some(1.0)),
      ("q", None), ("q", None), ("q", Some(-1.0)),
      ("r", None), ("r", None), ("r", None)))
  }

  test("resample rolls 5-min bars into the hour, picking true open/close") {
    // two 5-min bars inside 10:00 hour + one in 11:00
    val bars = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0, 5.0, 0.5, 2.0, 3L, 10.0),
      ("a", ts("2024-01-01 10:55:00"), 2.5, 6.0, 2.0, 4.0, 2L, 20.0),
      ("a", ts("2024-01-01 11:00:00"), 4.5, 4.5, 4.5, 4.5, 1L, 4.5))
      .toDF("series", "bar_ts", "open", "high", "low", "close",
        "n_ticks", "volume")
    val out = graft.ops.MarketBars
      .resample(bars, graft.ops.MarketBars.OneHourMicros)
      .orderBy("bar_ts").collect()
      .map(r => (r.getAs[Timestamp]("bar_ts").toString,
        r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"),
        r.getAs[Long]("n_ticks"), r.getAs[Double]("volume")))
    assert(out.toSeq === Seq(
      // open from the FIRST fine bar, close from the LAST
      ("2024-01-01 10:00:00.0", 1.0, 6.0, 0.5, 4.0, 5L, 30.0),
      ("2024-01-01 11:00:00.0", 4.5, 4.5, 4.5, 4.5, 1L, 4.5)))
  }

  test("profile summarizes each column from one unpivoted pass") {
    val df = Seq(
      (1.0, Option(3.0)), (2.0, Option(4.0)), (2.0, Option.empty[Double]))
      .toDF("a", "b")
    val out = graft.ops.Profiler.profile(df, Seq("a", "b"))
      .orderBy("col_name").collect()
      .map(r => (r.getAs[String]("col_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_non_null"), r.getAs[Long]("n_null"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("min_v"),
        r.getAs[Double]("max_v"), r.getAs[Double]("sum_v")))
    assert(out.toSeq === Seq(
      ("a", 3L, 3L, 0L, 2L, 1.0, 2.0, 5.0),
      ("b", 3L, 2L, 1L, 2L, 3.0, 4.0, 7.0)))
  }

  test("termCdf ranks by frequency and accumulates corpus share") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.termCdf(docs, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Int]("rank"), r.getAs[Double]("cum_share")))
    assert(out.toSeq === Seq(("a", 3L, 1, 0.6), ("b", 1L, 2, 0.8)))
  }

  test("vwap weighs closes by tick count; twap is the plain bar mean") {
    // day 1: (close 10 x 2 ticks) + (close 20 x 3 ticks)
    //   vwap = (10*2 + 20*3)/5 = 16, twap = 15
    val bars = Seq(
      ("a", ts("2024-01-01 10:00:00"), 10.0, 2L),
      ("a", ts("2024-01-01 10:05:00"), 20.0, 3L),
      ("a", ts("2024-01-02 10:00:00"), 7.0, 4L))
      .toDF("series", "bar_ts", "close", "n_ticks")
    val out = graft.ops.MarketBars.vwap(bars).orderBy("d").collect()
      .map(r => (r.getAs[Long]("n_bars"), r.getAs[Long]("n_ticks"),
        r.getAs[Double]("vwap"), r.getAs[Double]("twap")))
    assert(out.toSeq === Seq((2L, 5L, 16.0, 15.0), (1L, 4L, 7.0, 7.0)))
  }

  test("ewma follows the s/2 + x recurrence over the trailing frame") {
    // closes 1, 2, 4:
    //   row1 num=1      den=1    -> 1
    //   row2 num=2.5    den=1.5  -> 1.666667
    //   row3 num=5.25   den=1.75 -> 3
    val bars = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-01 10:05:00"), 2.0),
      ("a", ts("2024-01-01 10:10:00"), 4.0),
      ("b", ts("2024-01-01 10:00:00"), 9.0)) // other series unaffected
      .toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.ewma(bars, window = 20)
      .orderBy("series", "bar_ts").collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Int]("n"),
        r.getAs[Double]("ewma")))
    assert(out.toSeq === Seq(
      ("a", 1, 1.0), ("a", 2, 1.666667), ("a", 3, 3.0), ("b", 1, 9.0)))
    // window=1 degenerates to the close itself
    val w1 = graft.ops.MarketBars.ewma(bars, window = 1)
      .filter(col("ewma") =!= col("close"))
    assert(w1.count() === 0)
  }

  test("rsi: hand-computed gains/losses, warm-up nulls, flat midpoint") {
    val bars = Seq(
      // Δ chain for a: +1.0, -0.5, 0.0, +1.5
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-01 00:05:00"), 11.0),
      ("a", ts("2024-01-01 00:10:00"), 10.5),
      ("a", ts("2024-01-01 00:15:00"), 10.5),
      ("a", ts("2024-01-01 00:20:00"), 12.0),
      // flat series: both window sums zero -> 50.0 midpoint
      ("b", ts("2024-01-01 00:00:00"), 5.0),
      ("b", ts("2024-01-01 00:05:00"), 5.0),
      ("b", ts("2024-01-01 00:10:00"), 5.0))
      .toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.rsi(bars, period = 2)
      .orderBy("series", "bar_ts").collect()
      .map(r => (r.getAs[String]("series"),
        Option(r.getAs[java.lang.Double]("rsi")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      ("a", None),                 // no change yet
      ("a", None),                 // 1 of 2 changes observed
      ("a", Some(66.666667)),      // g=1.0, l=0.5 -> 100*2/3
      ("a", Some(0.0)),            // g=0, l=0.5
      ("a", Some(100.0)),          // g=1.5, l=0
      ("b", None),
      ("b", None),
      ("b", Some(50.0))))          // flat window midpoint
  }

  test("staleRuns collapses equal-close islands and profiles them") {
    val bars = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 00:05:00"), 1.0),
      ("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 00:15:00"), 2.0),
      ("a", ts("2024-01-01 00:20:00"), 2.0),
      ("a", ts("2024-01-01 00:25:00"), 3.0),
      ("b", ts("2024-01-01 00:00:00"), 4.0),
      ("b", ts("2024-01-01 00:05:00"), 5.0))
      .toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.staleRuns(bars, staleLen = 3)
      .orderBy("series").collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("n_runs"),
        r.getAs[Long]("n_bars"), r.getAs[Long]("max_run"),
        r.getAs[Long]("n_stale"), r.getAs[Double]("avg_run")))
    assert(out.toSeq === Seq(
      // runs for a: 1.0 x3, 2.0 x2, 3.0 x1
      ("a", 3L, 6L, 3L, 1L, 2.0),
      ("b", 2L, 2L, 1L, 0L, 1.0)))
  }

  test("cusum peaks exactly at a planted level shift") {
    // closes [1,1,1,5,5]: C'_i = 5·P_i − i·13e6 (x6 units) gives
    // |C'| = [8,16,24,12,0]e6 -> argmax i=3 (the last pre-shift bar),
    // magnitude 24e6/5/1e6 = 4.8
    val bars = Seq(1.0, 1.0, 1.0, 5.0, 5.0).zipWithIndex.map {
      case (v, i) => ("a", ts(f"2024-01-01 00:${i * 5}%02d:00"), v)
    }.toDF("series", "bar_ts", "close")
    val r = graft.ops.MarketBars.cusum(bars).collect().head
    assert(r.getAs[Long]("n_bars") === 5L)
    assert(r.getAs[Int]("cp_idx") === 3)
    assert(r.getAs[Timestamp]("cp_ts") === ts("2024-01-01 00:10:00"))
    assert(r.getAs[Double]("cusum_max") === 4.8)
  }

  test("cupedLift: y==x gives theta 1 and zero adjusted lift; constant x gives theta 0") {
    import spark.implicits._
    val pre = ts("2024-01-10 00:00:00")
    val post = ts("2024-01-20 00:00:00")
    val cutoff = col("ts") < to_timestamp(lit("2024-01-15 00:00:00"))
    // y == x per user: theta = cov/var = 1, adj = x̄ for every user
    // -> cuped lift exactly 0 whatever the hash split
    val ev1 = (1 to 20).flatMap { u =>
      Seq((u.toLong * 2, pre, u.toLong, "a", u.toDouble, "{}"),
        (u.toLong * 2 + 1, post, u.toLong, "a", u.toDouble, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r1 = graft.ops.EventAnalytics.cupedLift(ev1, cutoff).collect().head
    assert(r1.getAs[Long]("n_a") + r1.getAs[Long]("n_b") === 20L)
    assert(r1.getAs[Double]("theta") === 1.0)
    assert(r1.getAs[Double]("lift_cuped") === 0.0)
    // constant x: var(x) = 0 -> theta 0 -> cuped == raw
    val ev2 = (1 to 20).flatMap { u =>
      Seq((u.toLong * 2, pre, u.toLong, "a", 5.0, "{}"),
        (u.toLong * 2 + 1, post, u.toLong, "a", u.toDouble, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = graft.ops.EventAnalytics.cupedLift(ev2, cutoff).collect().head
    assert(r2.getAs[Double]("theta") === 0.0)
    assert(r2.getAs[Double]("lift_cuped") === r2.getAs[Double]("lift_raw"))
  }

  test("pageCusum: hand-run recursion — alarms, reset, first-alarm ts") {
    import spark.implicits._
    // mu0=1, k=0.5: d = [-0.5, 1.5, 1.5, -1.5, 2.5] (x6 units)
    // S  = [0, 1.5e6, 3e6, 1.5e6, 4e6]; h=2 -> alarms at bars 3, 5
    val bars = Seq(1.0, 3.0, 3.0, 0.0, 4.0).zipWithIndex.map {
      case (v, i) => ("a", ts(f"2024-01-01 00:${i * 5}%02d:00"), v)
    }.toDF("series", "bar_ts", "close")
    val base = Seq(("a", 1.0)).toDF("series", "mu0")
    val r = graft.ops.MarketBars.pageCusum(bars, base, slack = 0.5, h = 2.0)
      .collect().head
    assert(r.getAs[Long]("n_bars") === 5L)
    assert(r.getAs[Long]("n_alarms") === 2L)
    assert(r.getAs[Timestamp]("first_alarm_ts") === ts("2024-01-01 00:10:00"))
    assert(r.getAs[Double]("s_max") === 4.0)
  }

  test("rankSumDrift: hand-computed AUC; 0.5 on identical slices") {
    // t: slice {1,2} vs rest {2,3,3}: 2R1 = 2 + 5 = 7,
    // 2U1 = 7 − 2·3 = 1, AUC = 1/12 = 0.083333
    // u: identical {5,6} vs {5,6}: AUC = 0.5
    val ev = Seq(
      ("t", 1L, 1.0), ("t", 1L, 2.0),
      ("t", 2L, 2.0), ("t", 2L, 3.0), ("t", 2L, 3.0),
      ("u", 1L, 5.0), ("u", 1L, 6.0), ("u", 2L, 5.0), ("u", 2L, 6.0))
      .zipWithIndex
      .map { case ((ty, u, v), i) =>
        (i.toLong, ts("2024-01-01 00:00:01"), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.EventAnalytics.rankSumDrift(ev, col("user_id") === 1L)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("u1_x2"), r.getAs[Double]("auc")))
    assert(out.toSeq === Seq(
      ("t", 2L, 3L, 1L, 0.083333), ("u", 2L, 2L, 4L, 0.5)))
  }

  test("ksDrift: hand-computed sup-CDF distance; zero on identical slices") {
    // type t: slice values {1,2}, rest {2,3,3} -> sup at v=2:
    // |2·3 − 1·2| = 4 -> D = 4/6 = 0.666667 (floor-form 6dp)
    // type u: identical distributions -> D = 0
    val ev = Seq(
      ("t", 1L, 1.0), ("t", 1L, 2.0),
      ("t", 2L, 2.0), ("t", 2L, 3.0), ("t", 2L, 3.0),
      ("u", 1L, 5.0), ("u", 1L, 6.0), ("u", 2L, 5.0), ("u", 2L, 6.0))
      .map { case (ty, u, v) => (0L, ts("2024-01-01 00:00:01"), u, ty, v, "{}") }
      .zipWithIndex
      .map { case ((_, t, u, ty, v, p), i) => (i.toLong, t, u, ty, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.ops.EventAnalytics.ksDrift(ev, col("user_id") === 1L)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Double]("ks")))
    assert(out.toSeq === Seq(("t", 2L, 3L, 0.666667), ("u", 2L, 2L, 0.0)))
  }

  test("varianceRatio recovers the hand-computed VR on ±u returns") {
    // closes 100·e^cum with returns [u, u, -u, -u], u = 1e-3:
    // r8 = [1e5, 1e5, -1e5, -1e5], var1 = R². k=2 overlapping sums
    // rk = [2R, 0, -2R] -> vark = 8R²/3, VR = (8/3)/2 = 4/3
    val c = Seq(0.0, 0.001, 0.002, 0.001, 0.0).map(x => 100.0 * math.exp(x))
    val bars = c.zipWithIndex.map { case (v, i) =>
      ("a", ts(f"2024-01-01 00:${i * 5}%02d:00"), v)
    }.toDF("series", "bar_ts", "close")
    val r = graft.ops.MarketBars.varianceRatio(bars, k = 2).collect().head
    assert(r.getAs[Long]("n_rets") === 4L)
    assert(r.getAs[Long]("n_k") === 3L)
    assert(r.getAs[Double]("vr") === 1.333333)
  }

  test("varianceRatio: trending and flat series have zero var1 -> null") {
    val bars = (0 to 4).map { i =>
      // constant +u return every bar: var1 = 0, VR undefined
      ("t", ts(f"2024-01-01 00:${i * 5}%02d:00"), 100.0 * math.exp(0.001 * i))
    }.toDF("series", "bar_ts", "close")
    val r = graft.ops.MarketBars.varianceRatio(bars, k = 2).collect().head
    assert(r.getAs[Long]("n_rets") === 4L)
    assert(r.isNullAt(r.fieldIndex("vr")))
  }

  test("tearsheet matches the hand-computed annualized stats") {
    // day1 has TWO bars (daily close must pick the later, 100.0);
    // daily r8 = [1e5, -5e4] -> mu = 25e3, varp = 5.625e9
    val c1 = 100.0 * math.exp(0.001)
    val c2 = c1 * math.exp(-0.0005)
    val bars = Seq(
      ("a", ts("2024-01-01 10:00:00"), 99.0),
      ("a", ts("2024-01-01 15:00:00"), 100.0),
      ("a", ts("2024-01-02 15:00:00"), c1),
      ("a", ts("2024-01-03 15:00:00"), c2))
      .toDF("series", "bar_ts", "close")
    val r = graft.ops.MarketBars.tearsheet(bars).collect().head
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("n_rets") === 2L)
    assert(r.getAs[Double]("ann_return") === 0.063)
    assert(r.getAs[Double]("ann_vol") === 0.011906)
    assert(r.getAs[Double]("sharpe") === 5.291503)
    // peak is day2's close; day3 sits 0.0005 below it (floor-form 6dp)
    assert(r.getAs[Double]("max_drawdown") === -0.0005)
  }

  test("bipowerJump: planted jump shows, smooth geometric walk clamps to zero") {
    def bars(closes: Seq[Double]) = closes.zipWithIndex.map { case (c, i) =>
      ("a", ts(f"2024-01-01 10:${i * 5}%02d:00"), c)
    }.toDF("series", "bar_ts", "close")
    val jump = graft.ops.MarketBars
      .bipowerJump(bars(Seq(100.0, 101, 102, 103, 150, 151)))
      .collect().head
    assert(jump.getAs[Long]("n_rets") === 5L)
    assert(jump.getAs[Long]("m_pairs") === 4L)
    // the 103->150 return dominates RV but not BV
    assert(jump.getAs[Double]("jump_frac") > 0.3)
    assert(jump.getAs[Double]("rv") > jump.getAs[Double]("bv"))
    val smooth = graft.ops.MarketBars
      .bipowerJump(bars(Seq.tabulate(7)(k => 100.0 * math.pow(1.01, k))))
      .collect().head
    // equal |r| everywhere: BV's (pi/2)(m/(m-1))m factor exceeds n -> clamp
    assert(smooth.getAs[Double]("jump_frac") === 0.0)
  }

  test("ljungBox: alternation rejects whiteness; constant increments yield no rows") {
    def bars(closes: Seq[Double]) = closes.zipWithIndex.map { case (c, i) =>
      ("a", ts(f"2024-01-01 ${10 + i / 12}%02d:${(i % 12) * 5}%02d:00"), c)
    }.toDF("series", "bar_ts", "close")
    val alt = graft.ops.MarketBars
      .ljungBox(bars(Seq.tabulate(50)(k => if (k % 2 == 0) 100.0 else 101.0)))
      .collect().head
    assert(alt.getAs[Boolean]("reject_white"))
    assert(alt.getAs[Double]("q_stat") > 10.0)
    assert(alt.getAs[Long]("df_used") === 5L)
    // constant increments: zero variance at every lag -> r_acf all null
    val const = graft.ops.MarketBars
      .ljungBox(bars(Seq.tabulate(50)(k => 100.0 + k)))
      .collect()
    assert(const.isEmpty)
  }

  test("rfm: quintile scores and segment taxonomy on a 5-user ladder") {
    // user k: k purchase events of value 10 on day k -> user 5 is the
    // most recent, most frequent, highest spender
    val events = (1 to 5).flatMap { k =>
      (1 to k).map(i =>
        (100L + k, ts(f"2024-01-0$k%d 10:0$i%d:00"), "purchase", 10.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val out = EventAnalytics.rfm(events).collect()
      .map(r => r.getAs[String]("segment") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("avg_frequency"),
          r.getAs[Double]("avg_monetary"), r.getAs[Double]("avg_recency")))
      .toMap
    assert(out.keySet === Set("champions", "regular", "hibernating"))
    assert(out("champions") === ((2L, 4.5, 45.0, 0.5)))
    assert(out("regular") === ((1L, 3.0, 30.0, 2.0)))
    assert(out("hibernating") === ((2L, 1.5, 15.0, 3.5)))
  }

  test("engagementGini: zero on uniform counts, hand value on a dominant user") {
    def ev(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, u) =>
      (1 to c).map(i => (u.toLong, ts("2024-01-01 10:00:00"), "view", 1.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val flat = EventAnalytics.engagementGini(ev(Seq(3, 3, 3, 3))).collect().head
    assert(flat.getAs[Double]("gini") === 0.0)
    // counts asc [1,1,1,97]: G = 2*394/(4*100) - 5/4 = 0.72
    val skew = EventAnalytics.engagementGini(ev(Seq(97, 1, 1, 1))).collect().head
    assert(skew.getAs[Double]("gini") === 0.72)
    assert(skew.getAs[Long]("total_events") === 100L)
    // fewer than 10 users: the top decile is empty -> null share
    assert(skew.isNullAt(skew.fieldIndex("top_decile_share")))
  }

  test("eventStudy: single marker, hand AAR/CAR on a two-series fixture") {
    // series m (marker) jumps at bar 3; series a has constant log
    // return ln(1.01) everywhere -> AAR = that return at every offset
    // with data, CAR = cumulative
    val mkBars = (s: String, closes: Seq[Double]) =>
      closes.zipWithIndex.map { case (c, i) =>
        (s, ts(f"2024-01-01 10:${i * 5}%02d:00"), c)
      }
    val bars = (mkBars("error", Seq(100, 100, 100, 110, 110, 110)) ++
      mkBars("a", Seq(100, 101, 102.01, 103.0301, 104.060401, 105.10100501)))
      .toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.eventStudy(bars, "error",
        absCut = 0.05, maxOffset = 2)
      .orderBy("off").collect()
    val r = BigDecimal(math.log(1.01)).setScale(8,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // marker at idx 4 (bar 3) -> offsets -2..2 hit idx 2..6; idx 2..6
    // of series a have returns except idx 7 doesn't exist -> off +2
    // missing when out of range
    assert(out.map(_.getAs[Int]("off")).toSeq === Seq(-2, -1, 0, 1, 2))
    out.foreach { row =>
      assert(math.abs(row.getAs[Double]("aar") - r) < 2e-8,
        s"off ${row.getAs[Int]("off")}")
    }
    assert(math.abs(out.last.getAs[Double]("car") - 5 * r) < 1e-6)
  }

  test("riskDecomposition: identical series split risk 50/50") {
    val closes = Seq(100.0, 101, 99.5, 102, 100.7, 103)
    val bars = (for {
      s <- Seq("p", "q"); (c, i) <- closes.zipWithIndex
    } yield (s, ts(f"2024-01-01 10:${i * 5}%02d:00"), c))
      .toDF("series", "bar_ts", "close")
    val out = graft.ops.MarketBars.riskDecomposition(bars, Seq("p", "q"))
      .orderBy("series").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("pct_share") === 0.5)
      assert(r.getAs[Double]("contribution") > 0)
    }
    // port_var of two identical equal-weight series = var of one
    val varOne = {
      val d = closes.sliding(2).map { case Seq(a, b) => b - a }.toSeq
      val m = d.sum / d.size
      d.map(x => (x - m) * (x - m)).sum / (d.size - 1)
    }
    assert(math.abs(out.head.getAs[Double]("port_var") - varOne) < 1e-4)
  }

  test("volSignature: coarser scales shrink return counts, 5m matches hand RV") {
    val bars = (for {
      (c, i) <- Seq.tabulate(24)(k => 100.0 + (k % 3)).zipWithIndex
    } yield ("a", ts(f"2024-01-01 ${10 + i / 12}%02d:${(i % 12) * 5}%02d:00"),
        c, c, c, c, 1L, c))
      .toDF("series", "bar_ts", "open", "high", "low", "close",
        "n_ticks", "volume")
    val out = graft.ops.MarketBars.volSignature(bars)
      .orderBy("scale").collect()
      .map(r => r.getAs[String]("scale") ->
        (r.getAs[Long]("n_rets"), r.getAs[Double]("rv"))).toMap
    assert(out("05m")._1 === 23L)
    assert(out("15m")._1 === 7L)
    assert(out("60m")._1 === 1L)
    val rv5 = {
      val rs = Seq.tabulate(24)(k => 100.0 + (k % 3)).sliding(2).collect {
        case Seq(a, b) => BigDecimal(math.log(b / a)).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq
      math.sqrt(rs.map(r => r * r).sum)
    }
    assert(math.abs(out("05m")._2 - rv5) < 1e-5)
  }

  test("incrementalDailyAgg: splice equals the from-scratch rollup and is idempotent") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1.5),
      (2L, ts("2024-01-01 11:00:00"), "view", 2.5),
      (3L, ts("2024-01-02 10:00:00"), "click", 4.0),
      (4L, ts("2024-01-03 10:00:00"), "view", 8.0))
      .toDF("event_id", "ts", "event_type", "value")
    val late = ev.filter(col("event_id") === 2L) // day 1 is affected
    val early = ev.filter(col("event_id") =!= 2L)
    val base = graft.ops.WarehouseOps.dailyAgg(early)
    val full = graft.ops.WarehouseOps.dailyAgg(ev)
    val refreshed = graft.ops.WarehouseOps.incrementalDailyAgg(base, ev, late)
    assert(refreshed.except(full).count() === 0)
    assert(full.except(refreshed).count() === 0)
    // applying the same delta again changes nothing (recompute is
    // from the full source, not base + delta arithmetic)
    val again = graft.ops.WarehouseOps.incrementalDailyAgg(refreshed, ev, late)
    assert(again.except(full).count() === 0)
    assert(full.except(again).count() === 0)
  }
}
