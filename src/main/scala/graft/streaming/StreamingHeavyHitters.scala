package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CountMin

/** Streaming heavy-hitter maintenance — the continuous form of q69:
  * each micro-batch's keys are sketched with [[CountMin.build]] and the
  * cells are persisted; the live sketch is the cell-wise SUM of every
  * batch's cells, which is exactly the sketch of the concatenated
  * stream (count-min merges by addition — the property that makes the
  * sketch distributable AND streamable; CountMinSpec pins it).
  *
  * Replay safety: each batch overwrites its own `batch=<id>` partition
  * (the alerts-dir / StreamingContentDedup convention), so foreachBatch
  * at-least-once delivery cannot double-count — a replayed batch
  * replaces its own cells. Reading is merge-on-read (one tiny
  * depth×width aggregation over ≤ batches·depth·width cells);
  * [[graft.operators.Compaction.compactBatchTree]] folds committed
  * partitions when batch count grows. Per-batch cost scales with the BATCH (one
  * partial-agg over its keys), never with the stream's history.
  */
object StreamingHeavyHitters {

  /** Start the maintenance query over a streaming frame carrying
    * `keyCol`: per micro-batch, sketch and persist under
    * `path/batch=<id>`.
    */
  def run(stream: DataFrame, keyCol: String, path: String,
          depth: Int, width: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, keyCol, path, depth, width, batchId)
      }
      .start()

  /** One batch's sketch write — idempotent per `batchId`. */
  def writeBatch(batch: DataFrame, keyCol: String, path: String,
                 depth: Int, width: Int, batchId: Long): Unit =
    CountMin.build(batch, col(keyCol), depth, width)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The live merged sketch: cell-wise sum over all persisted batches
    * — identical to [[CountMin.build]] over the concatenated stream.
    * Before any batch has committed (empty stream, or a read racing
    * batch 0) the path has no partitions; that reads as the empty
    * sketch — every estimate 0 — not an error.
    */
  def sketch(spark: SparkSession, path: String): DataFrame = {
    // existence check, not a broad AnalysisException catch: a corrupt
    // or schema-conflicting tree must fail loudly, only the
    // nothing-committed-yet case reads as the empty sketch
    val batches =
      if (StreamingBatchDirs.exists(spark, path)) spark.read.parquet(path)
      else spark.range(0).select(
        lit(0).as("r"), lit(0L).as("bucket"), lit(0L).as("cnt"))
    batches
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }
}
