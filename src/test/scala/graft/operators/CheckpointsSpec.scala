package graft.operators

import graft.SparkSpec

/** Checkpoints.pin must upgrade to a RELIABLE checkpoint when the
  * session has a checkpoint dir (cluster deployments: survives executor
  * loss) and operators must inherit that via session config alone.
  */
class CheckpointsSpec extends SparkSpec {

  import spark.implicits._

  test("pin uses the reliable checkpoint dir when configured, local otherwise") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty) // test default: local mode
    val local = Checkpoints.pin(Seq(1, 2, 3).toDF("x"))
    assert(local.count() == 3)

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val reliable = Checkpoints.pin(Seq(4, 5).toDF("x"))
      assert(reliable.count() == 2)
      // the checkpoint dir now holds the materialized RDD files
      val files = java.nio.file.Files.walk(dir).count()
      assert(files > 1, s"expected checkpoint files under $dir")

      // an operator built on pin runs unchanged under reliable mode
      val labels = Dedup.connectedComponents(
        Seq((2L, 1L), (3L, 2L)).toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally {
      // restore the shared session: other suites must keep
      // localCheckpoint semantics regardless of suite ordering
      org.apache.spark.GraftCheckpointTestHook.clear(sc)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    assert(sc.getCheckpointDir.isEmpty)
  }
}
