package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Classic-mode bridge: lift a Catalyst [[Expression]] into a user-facing
  * [[Column]] (Spark 4 removed the public `new Column(expr)` constructor
  * when the Column API was decoupled for Connect).
  */
object graftcolumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Classic-mode bridge for checkpoint hygiene: expose the RDD that backs
  * a `Dataset.checkpoint`/`localCheckpoint` result (a [[execution.LogicalRDD]]
  * leaf) so [[graft.operators.Checkpoints.release]] can delete superseded
  * reliable checkpoint data instead of leaking it for the session's
  * lifetime. Returns None for any plan that is not a checkpoint leaf.
  */
object graftrdd {

  /** Unwrap join-strategy hint nodes: a pinned frame may be returned
    * with a `broadcast(...)` hint already applied (the tombstone
    * snapshot path bakes the small-set verdict into the frame), and the
    * hint must not hide the checkpoint leaf from [[backingRdd]] — a
    * release that silently no-ops leaks one localCheckpoint per
    * micro-batch (the round-13 storage-pressure class).
    */
  @annotation.tailrec
  private def unwrapHints(p: catalyst.plans.logical.LogicalPlan):
      catalyst.plans.logical.LogicalPlan = p match {
    case h: catalyst.plans.logical.UnresolvedHint => unwrapHints(h.child)
    case h: catalyst.plans.logical.ResolvedHint   => unwrapHints(h.child)
    case other                                    => other
  }

  def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df match {
      case d: classic.Dataset[_] =>
        unwrapHints(d.queryExecution.logical) match {
          case lr: execution.LogicalRDD => Some(lr.rdd)
          case _                        => None
        }
      case _ => None
    }
}
