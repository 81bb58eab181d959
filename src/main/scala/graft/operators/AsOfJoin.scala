package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row
  * with `rightTs <= leftTs` for the same key — the standard align
  * operation for event streams (last quote before a trade, last view
  * before a purchase, ...).
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + window max) explodes to
  * O(|l| x |r|) pairs per key before pruning — a scale-killer. This is
  * instead the union + running-window composition:
  *
  * {{{
  *   UNION both sides (right rows carry their payload in one struct,
  *     left rows carry null)
  *   -> one shuffle, partitioned by key, sorted by (ts, side)
  *   -> last(payload, ignoreNulls) over rows UNBOUNDED PRECEDING..CURRENT
  *   -> keep left rows
  * }}}
  *
  * Cost: ONE shuffle of |l| + |r| rows, O(1) state per row in the
  * running frame (Spark's UnboundedPrecedingWindowFunctionFrame updates
  * incrementally) — the same plan shape a hand-written merge-join would
  * produce, with Catalyst free to push filters below the union. At equal
  * timestamps the right row sorts first, so `<=` semantics hold.
  *
  * Caveats (documented contract):
  *  - right side should be unique per (keys, ts) — pre-reduce it
  *    (e.g. max payload per key+ts) for deterministic output;
  *  - rows with null `ts` sort first: left null-ts rows only ever see
  *    right null-ts rows.
  */
object AsOfJoin {

  private val TS = "__asof_ts"
  private val SIDE = "__asof_side"
  private val PAYLOAD = "__asof_payload"

  /** @param keys    equi-join key columns (must exist on both sides)
    * @param leftTs  event-time column name on `left`
    * @param rightTs event-time column name on `right`
    * @param prefix  prefix for the attached right columns in the output
    * @return `left.*` plus every non-key right column as `prefix + name`
    *         (null when no right row is at-or-before the left row)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      prefix: String = "asof_"): DataFrame = {
    val attach = right.columns.filterNot(keys.contains).toSeq
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(TS),
        lit(0).as(SIDE),
        struct(attach.map(col): _*).as(PAYLOAD)): _*)
    val l2 = left
      .withColumn(TS, col(leftTs))
      .withColumn(SIDE, lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached: Column = last(col(PAYLOAD), ignoreNulls = true).over(w)

    u.withColumn(PAYLOAD, attached)
      .filter(col(SIDE) === 1)
      .select(
        left.columns.map(col).toSeq ++
          attach.map(a => col(s"$PAYLOAD.$a").as(prefix + a)): _*)
  }
}
