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
    *
    * Storage lifecycle: a pinned frame's checkpoint data lives until
    * [[release]] deletes it (iterative operators release each round's
    * pin once the next round is materialized — bounded storage instead
    * of one leaked dir per round). The FINAL pin an operator returns to
    * its caller cannot be released eagerly (the returned DataFrame
    * reads it lazily); deployments should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so those
    * are deleted when the backing RDD is garbage-collected.
    */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)

  /** Unpersisting a localCheckpoint'd RDD warns that its lineage cannot
    * be recomputed — which is exactly [[release]]'s contract (the frame
    * is dead). Quiet that one logger ONLY for the duration of the
    * unpersist call (a permanent level change would also swallow any
    * future, genuine MapPartitionsRDD warning for the JVM's lifetime).
    */
  private def withQuietUnpersistWarn[A](f: => A): A = {
    val name = "org.apache.spark.rdd.MapPartitionsRDD"
    val prev = org.apache.logging.log4j.LogManager.getLogger(name).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      name, org.apache.logging.log4j.Level.ERROR)
    try f
    finally org.apache.logging.log4j.core.config.Configurator.setLevel(name, prev)
  }

  /** Free the storage behind a frame previously returned by [[pin]]:
    * deletes the reliable checkpoint directory (or unpersists the
    * localCheckpoint blocks). ONLY call once nothing will read `pinned`
    * again — a later read fails loudly on the missing data. No-op for
    * frames that did not come from [[pin]].
    */
  def release(pinned: DataFrame): Unit =
    org.apache.spark.sql.graftrdd.backingRdd(pinned).foreach { rdd =>
      rdd.getCheckpointFile match {
        case Some(file) =>
          val p = new org.apache.hadoop.fs.Path(file)
          p.getFileSystem(pinned.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        case None =>
          withQuietUnpersistWarn { rdd.unpersist(blocking = false) }
      }
    }
}
