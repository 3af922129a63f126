package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: `flatMapGroupsWithState` over a
  * user-keyed event stream, with one open session per user carried across
  * micro-batches. The streaming answer must CONVERGE to the batch
  * sessionization ([[graft.pipeline.Sessions]]) — same gap rule, same
  * session numbering — so the driver oracles it with the identical SQL.
  *
  * Sessions close in two ways:
  *  - in-batch: a gap between consecutive (sorted) events of the group;
  *  - end-of-stream: the caller appends one far-future SENTINEL event per
  *    user (any event > gap after the user's last real event), which
  *    forces the open session closed through the same gap rule. The
  *    sentinel's own session stays open in state and is never emitted.
  *
  * Scale shape: state is O(active users) — one fixed-size record each, no
  * event buffering (events fold into counters as they arrive); a batch's
  * work is one shuffle on the group key. Value sums accumulate as
  * 4-decimal-scaled longs (exact integer arithmetic), matching the
  * DECIMAL(18,4) cast the batch aggregation and the oracle use — the
  * emitted double is identical regardless of how events split across
  * micro-batches.
  *
  * Correctness precondition (standard for event-time state): a group's
  * events must not arrive later than `gap` out of order across batches —
  * feed batches in event-time order (the replay harness splits by time
  * range). Within a batch, arrival order is irrelevant (sorted in the
  * group handler).
  */
object StatefulSessions {

  /** Input event (timestamps in epoch micros — exact long arithmetic). */
  final case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double)

  /** Emitted closed session. */
  final case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      start_us: Long, end_us: Long, total_scaled: Long)

  /** Per-user state: the open session + the next session number. */
  final case class UserState(startUs: Long, endUs: Long, n: Long,
      totalScaled: Long, nextSeq: Long)

  /** value → exact 4-decimal-scaled long, HALF_UP like CAST(x AS
    * DECIMAL(18,4)) in both Spark and DuckDB.
    */
  def scale4(v: Double): Long =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** Sessionize a user-keyed stream. `gapSeconds` is the inactivity gap;
    * emits each session once, when it closes.
    */
  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def handle(user: Long, it: Iterator[Ev], state: GroupState[UserState])
        : Iterator[SessionOut] = {
      val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption.orNull
      val out = Seq.newBuilder[SessionOut]
      for (e <- evs) {
        if (st == null) {
          st = UserState(e.ts_us, e.ts_us, 1L, scale4(e.value), 1L)
        } else if (e.ts_us - st.endUs > gapUs) {
          out += SessionOut(user, st.nextSeq, st.n, st.startUs, st.endUs, st.totalScaled)
          st = UserState(e.ts_us, e.ts_us, 1L, scale4(e.value), st.nextSeq + 1)
        } else {
          st = st.copy(endUs = e.ts_us, n = st.n + 1,
            totalScaled = st.totalScaled + scale4(e.value))
        }
      }
      if (st != null) state.update(st)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }
}
