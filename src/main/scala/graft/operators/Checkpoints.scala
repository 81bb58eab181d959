package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization with the right durability for the deployment.
  *
  * Several operators must pin an intermediate so that (a) an expensive
  * upstream is computed exactly once across multiple consuming jobs and
  * (b) nondeterministic re-partitioning (`repartitionByRange` boundary
  * sampling, `rand()` salts) cannot produce a DIFFERENT layout on a
  * second computation. `localCheckpoint` does both on a single JVM, but
  * its blocks live only in executor storage: on a real cluster, losing
  * an executor loses partitions WITH their lineage — the job fails
  * (loudly, which is still better than a silent wrong answer, but a
  * failure nonetheless).
  *
  * [[pin]] therefore upgrades to a RELIABLE `checkpoint` — written to
  * the fault-tolerant checkpoint directory, surviving executor loss —
  * whenever the session has one configured
  * (`spark.sparkContext.setCheckpointDir(...)`), and falls back to
  * `localCheckpoint` otherwise (tests, local dev, bench). Operators
  * call [[pin]] and inherit cluster-grade durability from session
  * configuration alone; no API change per operator.
  */
object Checkpoints {

  /** Eagerly materialize `df`: reliable `checkpoint` if the session has
    * a checkpoint dir, else `localCheckpoint`. Both truncate lineage.
    */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)
}
