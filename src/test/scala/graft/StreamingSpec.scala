package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MarketBars, PairAnalytics}
import graft.sources.Tables
import graft.streaming.BarBuilder

case class Tick(event_type: String, ts: Timestamp, value: Double)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ticksFromEvents(n: Int): Seq[Tick] = {
    Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("value"))
      .orderBy("ts").limit(n)
      .collect()
      .map(r => Tick(r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSeq
  }

  test("streaming bars match batch bars on the same ticks (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = ticksFromEvents(2000)
    val stream = MemoryStream[Tick]
    val q = BarBuilder.bars(stream.toDF(), "event_type", "ts", "value")
      .writeStream.format("memory").queryName("bars_out")
      .outputMode("complete").start()
    try {
      // two micro-batches to exercise incremental state
      stream.addData(data.take(1000))
      q.processAllAvailable()
      stream.addData(data.drop(1000))
      q.processAllAvailable()
      val streamed = spark.table("bars_out")
        .select("series", "bar_ts", "high", "low", "n_ticks", "volume")
      val batch = MarketBars.bars(
          data.toDF("event_type", "ts", "value"), "event_type", "ts", "value")
        .select("series", "bar_ts", "high", "low", "n_ticks", "volume")
      assert(streamed.except(batch).count() === 0)
      assert(batch.except(streamed).count() === 0)
    } finally q.stop()
  }

  test("stateful rolling z-score matches the batch window across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference on real pair spreads
    val bars = MarketBars.bars(Tables.events(spark, sf), "event_type", "ts", "value")
    val spread = PairAnalytics.pairSpread(bars, "click", "view")
      .select("pair_name", "bar_ts", "spread").orderBy("bar_ts")
    val batchZ = PairAnalytics.rollingZScore(spread, windowRows = 5, minWindow = 3)
      .select(col("bar_ts"), col("window_size"), col("z_score"))
      .collect().map(r => (r.getTimestamp(0),
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap

    val points = spread.collect().map(r =>
      BarBuilder.SpreadPoint(r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    val stream = MemoryStream[BarBuilder.SpreadPoint]
    val q = BarBuilder.rollingZScore(stream.toDS(), windowRows = 5, minWindow = 3)
      .writeStream.format("memory").queryName("z_out")
      .outputMode("append").start()
    try {
      val (h1, h2) = points.splitAt(points.length / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      val streamed = spark.table("z_out").collect()
      assert(streamed.length === points.length)
      streamed.foreach { r =>
        val ts = r.getAs[Timestamp]("bar_ts")
        val (bn, bz) = batchZ(ts)
        assert(r.getAs[Int]("window_size").toLong === bn, s"window_size@$ts")
        val sz = Option(r.getAs[Any]("z_score")).map(_.asInstanceOf[Double])
        (sz, bz) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"z@$ts")
          case (a, b) => assert(a === b, s"z null-ness@$ts")
        }
      }
    } finally q.stop()
  }
}
