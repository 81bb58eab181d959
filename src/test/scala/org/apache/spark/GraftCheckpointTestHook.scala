package org.apache.spark

/** Test-only: SparkContext has `setCheckpointDir` but no unset; the
  * underlying var is `private[spark]`. CheckpointsSpec must restore the
  * shared test session to no-checkpoint-dir so other suites keep their
  * localCheckpoint behavior regardless of suite ordering.
  */
object GraftCheckpointTestHook {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
