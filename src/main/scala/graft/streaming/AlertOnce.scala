package graft.streaming

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
  * nothing grows with row count. Pair with `withWatermark` +
  * `EventTimeTimeout` when the key space is unbounded; the no-timeout
  * variant here matches the reference's never-expiring seen-set.
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
}
