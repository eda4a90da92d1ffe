package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming transition extractor — the live twin of the
  * batch first-order Markov matrix (`ops/EventAnalytics.transitions`,
  * q120). Batch lags over the whole history; the stream emits each
  * (prev_type → next_type) edge the moment the successor event
  * arrives, so a downstream aggregation (or alerting rule on a
  * never-seen transition) is always current.
  *
  * State per user is the LAST event only — (type, ts, event_id) —
  * constant memory regardless of history length, the same
  * cheapest-stateful-operator class as the drawdown monitor's running
  * peak. Rows inside a micro-batch fold in (ts, event_id) order —
  * the batch lag's exact tie-break — and rows at or before the last
  * applied (ts, event_id) are dropped (replay guard).
  */
object TransitionStream {

  case class Ev(
      user_id: Long,
      ts: Timestamp,
      event_id: Long,
      event_type: String,
      value: Double)

  case class Edge(
      user_id: Long,
      ts: Timestamp,
      prev_type: String,
      next_type: String,
      value: Double)

  case class TState(lastType: String, lastTs: Long, lastId: Long)

  def transitions(events: Dataset[Ev]): Dataset[Edge] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TState, Edge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[TState]) =>
          var st = state.getOption.getOrElse(TState(null, Long.MinValue, Long.MinValue))
          val out = Vector.newBuilder[Edge]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val newer = e.ts.getTime > st.lastTs ||
              (e.ts.getTime == st.lastTs && e.event_id > st.lastId)
            if (newer) {
              if (st.lastType != null)
                out += Edge(user, e.ts, st.lastType, e.event_type, e.value)
              st = TState(e.event_type, e.ts.getTime, e.event_id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
