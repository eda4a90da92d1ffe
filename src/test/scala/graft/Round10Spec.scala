package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MarketBars

/** Round-10 additions: the |days|²-per-series daily pair family
  * (theilSen / mannKendall / sampleEntropy) must REFUSE a horizon
  * past MarketBars.MaxPairDays instead of planning a 10⁸⁺-row
  * per-series self-join, and must keep working right at the cap's
  * working side.
  */
class Round10Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** One bar per synthetic day — `n` distinct days on one series.
    * Days are synthesized by the hour to keep Timestamp construction
    * cheap; what matters is that to_date() yields `n` DISTINCT days. */
  private def longHorizonBars(n: Int) = {
    // 24 hourly bars/day would collapse to the same day; instead step
    // whole days from a fixed epoch
    val day0 = java.time.LocalDate.of(1970, 1, 15)
    (0 until n).map { i =>
      val d = day0.plusDays(i.toLong)
      ("S1", Timestamp.valueOf(d.atTime(15, 0)),
        100.0 + (i % 37) * 0.25)
    }.toDF("series", "bar_ts", "close")
  }

  test("the daily-pair horizon guard fires past MaxPairDays without planning the join") {
    val tooLong = longHorizonBars(MarketBars.MaxPairDays.toInt + 50)
    Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      ("theilSen", MarketBars.theilSen(_)),
      ("mannKendall", MarketBars.mannKendall(_)),
      ("sampleEntropy", MarketBars.sampleEntropy(_))
    ).foreach { case (name, op) =>
      val e = intercept[IllegalArgumentException](op(tooLong))
      assert(e.getMessage.contains("MaxPairDays"), s"$name: ${e.getMessage}")
    }
  }

  test("the daily-pair family still runs under the cap") {
    val ok = longHorizonBars(120)
    val ts = MarketBars.theilSen(ok).collect()
    assert(ts.length === 1 && !ts.head.isNullAt(
      ts.head.fieldIndex("theil_sen")))
    val mk = MarketBars.mannKendall(ok).collect()
    assert(mk.length === 1 && mk.head.getAs[Long]("n_pairs") === 120L * 119 / 2)
    val se = MarketBars.sampleEntropy(ok).collect()
    assert(se.length === 1)
  }
}
