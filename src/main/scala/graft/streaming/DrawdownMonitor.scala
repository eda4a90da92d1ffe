package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming drawdown monitor — the live twin of the batch
  * running-peak drawdown (`ops/EventAnalytics.drawdown`, q83). Batch
  * reports the deepest drop after the fact; the stream emits the
  * (peak, drawdown) path tick by tick so a risk alarm can fire
  * mid-session.
  *
  * State per key is TWO numbers (running peak + last applied event
  * time) — constant memory regardless of history length, which is why
  * a running extremum is the cheapest stateful operator a stream can
  * carry (contrast the z-score monitor's window buffer,
  * [[BarBuilder.rollingZScore]]). Same replay guard as the z-score:
  * rows inside a micro-batch fold in event-time order, rows at or
  * before the last applied timestamp are dropped.
  */
object DrawdownMonitor {

  case class Tick(series: String, ts: Timestamp, value: Double)

  case class DdPoint(
      series: String,
      ts: Timestamp,
      value: Double,
      peak: Double,
      drawdown: Double)

  case class DdState(peak: Double, lastTs: Long)

  def drawdowns(ticks: Dataset[Tick]): Dataset[DdPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.series)
      .flatMapGroupsWithState[DdState, DdPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series, rows, state: GroupState[DdState]) =>
          var st = state.getOption
            .getOrElse(DdState(Double.NegativeInfinity, Long.MinValue))
          val out = Vector.newBuilder[DdPoint]
          rows.toSeq.sortBy(_.ts.getTime).foreach { t =>
            if (t.ts.getTime > st.lastTs) {
              val peak = math.max(st.peak, t.value)
              st = DdState(peak, t.ts.getTime)
              out += DdPoint(series, t.ts, t.value, peak, t.value - peak)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
