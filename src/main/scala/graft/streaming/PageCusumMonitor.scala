package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming Page-CUSUM drift monitor — the live twin of the
  * batch path (`ops/MarketBars.pageCusumPath`, q146). Page's test IS
  * the sequential algorithm (S := max(0, S + x − μ0 − k), alarm when
  * S > h), so the stream runs the recursion literally while batch
  * replays it through the prefix-sum identity; both hold S as an
  * exact long in 1e-6 units, so stream == batch bit-for-bit
  * (StreamingSpec asserts set equality on alarm bars).
  *
  * State per series is TWO longs (S and the last applied event time)
  * — constant memory, the DrawdownMonitor class. Rows inside a
  * micro-batch fold in event-time order; rows at or before the last
  * applied timestamp are dropped (replay guard). Series without a
  * baseline entry are ignored.
  */
object PageCusumMonitor {

  case class Bar(series: String, ts: Timestamp, close: Double)

  case class Alarm(series: String, ts: Timestamp, s6: Long)

  case class St(s6: Long, lastTs: Long)

  def alarms(
      bars: Dataset[Bar],
      mu0: Map[String, Double],
      slack: Double,
      h: Double): Dataset[Alarm] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val k6 = math.floor(slack * 1e6 + 0.5).toLong
    val h6 = math.floor(h * 1e6 + 0.5).toLong
    val m6 = mu0.map { case (s, v) => s -> math.floor(v * 1e6 + 0.5).toLong }
    bars
      .groupByKey(_.series)
      .flatMapGroupsWithState[St, Alarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series, rows, state: GroupState[St]) =>
          m6.get(series) match {
            case None => Iterator.empty
            case Some(mu6) =>
              var st = state.getOption.getOrElse(St(0L, Long.MinValue))
              val out = Vector.newBuilder[Alarm]
              rows.toSeq.sortBy(_.ts.getTime).foreach { b =>
                val t = b.ts.getTime
                if (t > st.lastTs) {
                  val x6 = math.floor(b.close * 1e6 + 0.5).toLong
                  val s = math.max(0L, st.s6 + (x6 - mu6 - k6))
                  st = St(s, t)
                  if (s > h6) out += Alarm(series, b.ts, s)
                }
              }
              state.update(st)
              out.result().iterator
          }
      }
  }
}
