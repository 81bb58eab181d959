package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CountMin

case class KeyIn(key: String)

/** [[StreamingHeavyHitters]]: the merged on-disk sketch equals the
  * batch sketch of the concatenated stream, and per-batch writes are
  * idempotent under replay.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("merged sketch over batches == one-shot sketch of all data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("shh").toString
    val in = MemoryStream[KeyIn]
    val q = StreamingHeavyHitters.run(in.toDF(), "key",
      path = s"$dir/cms", depth = 3, width = 256, checkpoint = s"$dir/ckpt")
    val b1 = Seq("a", "b", "a", "c")
    val b2 = Seq("a", "c", "d", "d", "d")
    try {
      in.addData(b1.map(KeyIn)); q.processAllAvailable()
      in.addData(b2.map(KeyIn)); q.processAllAvailable()
    } finally q.stop()

    val merged = StreamingHeavyHitters.sketch(spark, s"$dir/cms")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = CountMin.build((b1 ++ b2).toDF("key"), $"key", 3, 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot,
      s"cell-wise sum must equal the one-shot sketch: $merged vs $oneShot")

    // estimates through the merged sketch match exact counts (wide
    // enough sketch for 4 distinct keys: no collisions)
    val est = CountMin.estimate(Seq("a", "d", "b").toDF("key"), $"key",
      StreamingHeavyHitters.sketch(spark, s"$dir/cms"), 3, 256, "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 3L, "d" -> 3L, "b" -> 1L), est)
  }

  test("sketch before any batch commits is empty, estimates read as 0") {
    val dir = java.nio.file.Files.createTempDirectory("shh0").toString
    val merged = StreamingHeavyHitters.sketch(spark, s"$dir/cms")
    assert(merged.columns.toSeq == Seq("r", "bucket", "cnt"))
    assert(merged.count() == 0L)
    val est = CountMin.estimate(Seq("a").toDF("key"), $"key",
      merged, 3, 256, "e").collect().map(_.getLong(1))
    assert(est.toSeq == Seq(0L), s"empty sketch must estimate 0: ${est.toSeq}")
  }

  test("replayed batch overwrites its own partition — no double count") {
    val dir = java.nio.file.Files.createTempDirectory("shh2").toString
    val batch = Seq("x", "x", "y").toDF("key")
    StreamingHeavyHitters.writeBatch(batch, "key", s"$dir/cms", 3, 256, batchId = 7L)
    StreamingHeavyHitters.writeBatch(batch, "key", s"$dir/cms", 3, 256, batchId = 7L)
    val est = CountMin.estimate(Seq("x").toDF("key"), $"key",
      StreamingHeavyHitters.sketch(spark, s"$dir/cms"), 3, 256, "e")
      .collect().map(_.getLong(1))
    assert(est.toSeq == Seq(2L), s"replay must not double-count: ${est.toSeq}")
  }
}
