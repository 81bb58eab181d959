package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream joins — the streaming twin of the q29
  * interval join (SURVEY §2.10; reference `app/filter/recency.py`
  * correlates only within a batch, so this is north-star surface).
  *
  * Stream-stream joins are the one streaming operator whose state can
  * grow without bound if the time constraint is missing: Spark must
  * buffer every left row until it can prove no future right row can
  * match it. The interval predicate plus BOTH watermarks give the
  * planner that proof — left rows evict once the right watermark
  * passes `l.ts + horizon`, right rows once the left watermark passes
  * `r.ts`. At scale the join state is hash-partitioned by the equality
  * key across executors and bounded by horizon × per-key arrival rate,
  * independent of stream length.
  */
object StreamingJoins {

  /** Attribute each `right` event to the `left` events with the same
    * `key` within `[l.ts, l.ts + horizon]` — the conversion-attribution
    * join (view → purchase). Both inputs must carry an event-time `ts`
    * column; `delay` is the allowed out-of-orderness on each side.
    * Inner joins emit eagerly as matches arrive; `left_outer` emits the
    * null-extended row only after the watermark proves no match can
    * come (append mode — the only mode stream-stream joins support).
    * The output keeps both sides accessible under the `l`/`r` aliases.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   delay: String, horizon: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", delay).alias("l")
    val r = right.withWatermark("ts", delay).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $horizon"),
      joinType)
  }
}
