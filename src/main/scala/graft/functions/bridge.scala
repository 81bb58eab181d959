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
  def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df match {
      case d: classic.Dataset[_] =>
        d.queryExecution.logical match {
          case lr: execution.LogicalRDD => Some(lr.rdd)
          case _                        => None
        }
      case _ => None
    }
}
