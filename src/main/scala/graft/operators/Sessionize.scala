package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream, batch form (the
  * streaming twin is a `session_window` aggregation — SURVEY.md §2.10).
  *
  * Two shuffle-free-after-the-first-shuffle windows over (user, ts): a lag
  * to mark session starts, a running sum to number sessions. Scale note:
  * the single shuffle is on `userCol`; skewed power users are bounded by
  * per-user event counts, and AQE skew-join handling applies if a session
  * aggregate joins onwards.
  */
object Sessionize {

  /** Assign a session id per user: a new session starts when the gap from
    * the previous event exceeds `gapSeconds`.
    */
  def assign(events: DataFrame, userCol: Column, ts: Column, tieBreak: Column,
             gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(ts, tieBreak)
    val prev = lag(ts, 1).over(w)
    val isNew = when(
      prev.isNull || unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }
}
