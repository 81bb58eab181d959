package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming user-journey transitions — the stream-native twin of the
  * q128 batch matrix: per-user keyed state remembers the LAST event
  * across micro-batches, so cross-batch pairs (batch N's last event →
  * batch N+1's first) are emitted exactly once, which a per-batch
  * lead() window can never see (SURVEY §2.10 custom-state surface,
  * the [[AlertOnce]] pattern).
  *
  * Contract: events arrive in order per user ACROSS batches (the
  * upstream keyed queue's guarantee); within a batch, rows are sorted
  * by (event time, event id) before pairing, so shuffle order can't
  * flip pairs between replays. State is one
  * [[StreamingTransitions.LastEvent]] per user — hash-partitioned in
  * the state store, nothing grows with event count; for unbounded user
  * spaces the [[AlertOnce.withTtl]] timeout pattern applies unchanged.
  *
  * Emitted counts are per-batch partials: downstream aggregates them
  * into the (from, to) matrix incrementally; replaying a batch after a
  * sink failure re-emits the same pairs (state only advances on
  * commit), keeping the matrix consistent under the
  * [[StreamingCardStats]] replay-safe partial-aggregation discipline.
  */
object StreamingTransitions {

  case class Ev(user_id: Long, event_id: Long, us: Long, event_type: String)

  case class Transition(user_id: Long, from_type: String, to_type: String)

  case class LastEvent(us: Long, event_id: Long, event_type: String)

  /** Per-user state transition: pair the sorted batch internally, plus
    * the carried last event as the first pair's `from` side.
    */
  def onGroup(
      uid: Long,
      rows: Iterator[Ev],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    val batch = rows.toSeq.sortBy(e => (e.us, e.event_id))
    if (batch.isEmpty) Iterator.empty
    else {
      val types = (if (state.exists) Seq(state.get.event_type) else Nil) ++
        batch.map(_.event_type)
      val out = types.sliding(2).collect {
        case Seq(a, b) => Transition(uid, a, b)
      }.toVector
      val last = batch.last
      state.update(LastEvent(last.us, last.event_id, last.event_type))
      out.iterator
    }
  }

  /** Wire the operator over a (streaming or batch) event Dataset. */
  def apply(events: Dataset[Ev]): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[Transition]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(onGroup)
  }
}
