package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming stale-price monitor — the live twin of the batch
  * gaps-and-islands run profile (`ops/MarketBars.staleRuns`, q136).
  * Batch collapses equal-close islands after the fact; the stream
  * emits each completed run THE MOMENT a differing close breaks it, so
  * a stuck-feed alarm can fire while the feed is still stuck.
  *
  * State per key is one open run — (close, start, end, length) plus
  * the last applied event time — constant memory regardless of
  * history. The trailing run stays open in state by design (its length
  * is unknown until something breaks it); batch parity therefore holds
  * over COMPLETED runs, which is exactly what StreamingSpec asserts.
  * Same replay guard as the other monitors: rows inside a micro-batch
  * fold in event-time order, rows at or before the last applied
  * timestamp are dropped.
  */
object StaleRunMonitor {

  case class Bar(series: String, ts: Timestamp, close: Double)

  case class Run(
      series: String,
      start_ts: Timestamp,
      end_ts: Timestamp,
      close: Double,
      run_len: Long)

  case class RunState(
      close: Double,
      startTs: Long,
      endTs: Long,
      runLen: Long,
      lastTs: Long)

  def completedRuns(bars: Dataset[Bar]): Dataset[Run] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.series)
      .flatMapGroupsWithState[RunState, Run](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series, rows, state: GroupState[RunState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Run]
          rows.toSeq.sortBy(_.ts.getTime).foreach { b =>
            val t = b.ts.getTime
            if (st == null) {
              st = RunState(b.close, t, t, 1L, t)
            } else if (t > st.lastTs) {
              if (b.close == st.close) {
                st = st.copy(endTs = t, runLen = st.runLen + 1, lastTs = t)
              } else {
                out += Run(series, new Timestamp(st.startTs),
                  new Timestamp(st.endTs), st.close, st.runLen)
                st = RunState(b.close, t, t, 1L, t)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
