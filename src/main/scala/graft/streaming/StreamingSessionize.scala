package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-sessionization — the `session_window` twin of the
  * batch [[graft.operators.Sessionize]] (SURVEY.md §2.10): per-user
  * sessions close when no event arrives within `gap`, and each CLOSED
  * session emits exactly once, when the watermark passes its end.
  *
  * Deliberately the BUILT-IN `session_window` aggregation, not a
  * custom `flatMapGroupsWithState`: Spark's session windows already
  * merge out-of-order events into the right session while they are
  * inside the watermark, keep per-key state bounded by open sessions
  * only, and emit on watermark progress — hand-rolled state would
  * re-implement all three, worse (the functions-not-UDFs rule applied
  * to state). Custom state remains the right tool where the built-in
  * cannot express the semantics (the [[AlertOnce]] TTL contract, the
  * [[StreamingTransitions]] exactly-once pair emission).
  *
  * Boundary semantics: `session_window` is half-open — an event
  * arriving EXACTLY `gap` after the last one starts a NEW session,
  * where the batch operator's `diff > gap` keeps it (a documented
  * 1-microsecond boundary difference; both are total orders).
  *
  * Scale: state is hash-partitioned by the grouping key; per-user
  * state is O(open sessions), and the watermark bounds how long a
  * session can stay open — skewed power users cost events, not state.
  */
object StreamingSessionize {

  /** Closed sessions `(userCol, session_start, session_end, n_events)`
    * of a streaming frame. `session_end` is `last event + gap` (the
    * `session_window` convention). Run with OutputMode.Append so only
    * watermark-closed sessions emit.
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
