package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Alert-once keyed state: emit an alert the FIRST time a key qualifies,
  * suppress (but count) repeats across micro-batches.
  *
  * The reference fires a Telegram alert per qualifying row per run
  * (main.py:123-129), which re-alerts on every re-crawl of the same
  * funding event; the store-merge only dedups rows, not side effects.
  * This operator is the stream-native fix — custom keyed state via
  * `flatMapGroupsWithState` (SURVEY §2.10), the tool for semantics the
  * built-ins (`dropDuplicates`, `session_window`) can't express: we
  * both dedup AND enrich the first emission with how many duplicates
  * arrived before state was first written, and keep counting after.
  *
  * Scale: state is one small [[AlertOnce.SeenState]] per distinct key,
  * hash-partitioned by key across executors in the state store —
  * nothing grows with row count. The no-timeout [[AlertOnce.apply]]
  * matches the reference's never-expiring seen-set (state ∝ distinct
  * keys ever seen — fine for company-sized key spaces); for UNBOUNDED
  * key spaces use [[AlertOnce.withTtl]], whose watermark-driven
  * event-time timeout keeps state ∝ keys active within one TTL horizon.
  */
object AlertOnce {

  /** A candidate alert row (the F10-filtered A/B-tier projection). */
  case class Candidate(key: String, tier: String, detail: String)

  /** Emitted exactly once per key, on first sighting. */
  case class FirstAlert(key: String, tier: String, detail: String)

  case class SeenState(nSuppressed: Long)

  /** State-transition function: first batch with the key emits one
    * [[FirstAlert]]; every later sighting bumps the suppression count.
    *
    * The emitted row is the MINIMUM candidate by (tier, detail), not
    * "whichever arrived first": the group iterator's order is shuffle
    * order, which varies with partitioning — a deterministic pick keeps
    * reruns and retries bit-identical.
    */
  def onGroup(
      key: String,
      rows: Iterator[Candidate],
      state: GroupState[SeenState]): Iterator[FirstAlert] = {
    val batch = rows.toSeq
    if (state.exists) {
      state.update(SeenState(state.get.nSuppressed + batch.size))
      Iterator.empty
    } else {
      state.update(SeenState(batch.size - 1L)) // duplicates within batch 1
      batch.sortBy(c => (c.tier, c.detail)).headOption
        .map(c => FirstAlert(c.key, c.tier, c.detail)).iterator
    }
  }

  /** Wire the operator over a (streaming or batch) candidate Dataset. */
  def apply(candidates: Dataset[Candidate]): Dataset[FirstAlert] = {
    implicit val stateEnc = Encoders.product[SeenState]
    implicit val outEnc = Encoders.product[FirstAlert]
    candidates
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(onGroup)
  }

  // ------------------------------------------------------- bounded-state TTL

  /** A candidate with an event time, for the TTL variant. */
  case class TimedCandidate(
      key: String, tier: String, detail: String, eventTime: Timestamp)

  /** TTL state transition: like [[onGroup]], but every sighting arms an
    * event-time timeout at `maxEventTime(batch) + ttl`; when the
    * watermark passes it, the state row is REMOVED. A key that
    * reappears after eviction re-alerts — that is the price of bounded
    * state, and the same contract `dropDuplicatesWithinWatermark`
    * pins for the streaming dedup (StreamingDedupSpec): suppression is
    * exact within the TTL horizon, at-least-once beyond it.
    */
  def onGroupTtl(ttlMs: Long)(
      key: String,
      rows: Iterator[TimedCandidate],
      state: GroupState[SeenState]): Iterator[FirstAlert] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toSeq
      val emit =
        if (state.exists) {
          state.update(SeenState(state.get.nSuppressed + batch.size))
          Iterator.empty[FirstAlert]
        } else {
          state.update(SeenState(batch.size - 1L))
          batch.sortBy(c => (c.tier, c.detail)).headOption
            .map(c => FirstAlert(c.key, c.tier, c.detail)).iterator
        }
      // sliding TTL: every sighting extends the key's lease, so only
      // keys genuinely cold for `ttl` of EVENT time get evicted
      state.setTimeoutTimestamp(
        batch.map(_.eventTime.getTime).max + ttlMs)
      emit
    }
  }

  /** Bounded-state alert-once for UNBOUNDED key spaces: state survives
    * `ttl` of event time past a key's last sighting, then is evicted by
    * the watermark — total state is O(keys active within one TTL
    * horizon), not O(all keys ever), which is the difference between a
    * fixed-size state store and an unbounded one at 100× key
    * cardinality. `delayThreshold` is the out-of-orderness bound
    * (watermark delay); `ttl` the suppression horizon.
    */
  def withTtl(
      candidates: Dataset[TimedCandidate],
      delayThreshold: String,
      ttlMs: Long): Dataset[FirstAlert] = {
    implicit val stateEnc = Encoders.product[SeenState]
    implicit val outEnc = Encoders.product[FirstAlert]
    candidates
      .withWatermark("eventTime", delayThreshold)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onGroupTtl(ttlMs))
  }
}
