package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming IVF index maintenance — the vector-index member of the
  * incremental family (band index: [[StreamingContentDedup]]; count-min:
  * [[StreamingHeavyHitters]]; dataset card: [[StreamingCardStats]]):
  * each micro-batch of new vectors is coarse-assigned against the FIXED
  * broadcast centroids and its inverted-list rows `(cell, cand_id, cv,
  * _cn)` land under `batch=<id>`; the live index is the union of every
  * batch — exactly [[Similarity.writeIvfIndex]]'s lists over the
  * concatenated stream, because assignment is per-row against frozen
  * centroids. Probes answer through the unchanged
  * [[Similarity.knnIvfIndexed]].
  *
  * The frozen-quantizer assumption is the standard production contract:
  * cells drift only when the data distribution does, at which point you
  * RETRAIN and rebuild — continuously re-clustering would re-assign old
  * vectors and force a full rewrite per batch, which is exactly the
  * cost this maintenance scheme exists to avoid. Replay safety: each
  * batch overwrites its own partition (at-least-once foreachBatch
  * cannot double-insert); [[graft.operators.Compaction.compactBatchTree]] folds committed
  * partitions when batch count grows (a full re-bucketing into the
  * [[Similarity.writeIvfIndex]] layout is the retrain-time rebuild).
  */
object StreamingVectorIndex {

  /** Start the maintenance query over a streaming frame carrying
    * `(cand_id, cv)`: per micro-batch, assign against `centroids` and
    * persist the list rows under `path/batch=<id>`.
    */
  def run(stream: DataFrame, centroids: DataFrame, path: String,
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, centroids, path, batchId)
      }
      .start()

  /** One batch's inverted-list rows — idempotent per `batchId`.
    * Sorted by `cell` within each output partition: the batch tree is
    * partitioned by batch (not cell), so a probe scans every file —
    * cell-clustered row groups let the parquet reader's min/max stats
    * skip the cells a probe never touches, the cheap half of the
    * pruning [[rebuildIndex]]'s bucketed layout buys fully.
    */
  def writeBatch(batch: DataFrame, centroids: DataFrame, path: String,
                 batchId: Long): Unit =
    Similarity.ivfAssign(batch, "cv", "cand_id", centroids)
      .withColumn("_cn", graft.functions.GraftFunctions.l2norm(col("cv")))
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The live inverted lists: the union of all persisted batches, in
    * the exact shape [[Similarity.knnIvfIndexed]] consumes. Reads as
    * the empty index before any batch commits — with the
    * embeddings-table convention types: `cand_id` long, `cv`
    * `array<float>`, `cell` long. The POST-commit schema instead
    * mirrors whatever [[writeBatch]] wrote, i.e. the stream's
    * `cand_id`/`cv` types and the centroids' `centroid_id` type —
    * callers off the convention (string ids, double vectors, int
    * cells) that union against the pre-commit frame should either cast
    * or use the template overload below, which cannot drift.
    */
  def lists(spark: SparkSession, path: String): DataFrame =
    // existence check, not a broad catch — see [[StreamingBatchDirs]]
    (if (StreamingBatchDirs.exists(spark, path)) spark.read.parquet(path)
     else spark.range(0).select(lit(0L).as("cand_id"),
       lit(null).cast("array<float>").as("cv"), lit(0L).as("cell"),
       lit(0.0).as("_cn"))).drop("batch")

  /** IVF top-k over base index ∪ streamed segments — the vector twin
    * of [[StreamingPostingsIndex.probeLive]]: the base lists and
    * centroids come from the [[Similarity.writeIvfIndex]] catalog
    * tables under `basePrefix` (the frozen quantizer), the streamed
    * rows from the batch tree, and deletes recorded against
    * `basePrefix` ([[graft.operators.Tombstones]]) filter the WHOLE
    * union — a takedown covers base vectors and streamed appends with
    * one marker.
    */
  def probeLive(spark: SparkSession, basePrefix: String, path: String,
                probes: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val (cent, baseLists) = Similarity.readIvfIndex(spark, basePrefix)
    // pre-commit schema comes from the BASE lists via the template
    // overload, so a base index off the embeddings convention (string
    // ids, double vectors) unions cleanly before the first batch
    // commits — the drift the template overload exists to prevent
    val streamed = graft.operators.Tombstones.filter(spark, basePrefix,
      lists(spark, path, baseLists.select(col("cand_id"), col("cv")), cent),
      "cand_id")
    Similarity.knnIvfIndexed(probes, cent,
      baseLists.unionByName(
        streamed.select(baseLists.columns.map(col): _*)), k, nprobe)
  }

  /** Retrain-time rebuild — the lifecycle step the frozen-quantizer
    * contract defers to: fold every committed batch partition of the
    * streaming tree into the bucketed [[Similarity.writeIvfIndex]]
    * catalog layout, re-assigned against the NEW (retrained) centroids.
    * After the rebuild the index serves probes through the same
    * [[Similarity.knnIvfIndexed]] path with no batch-union scan and the
    * cell join co-partitioned from disk, and a fresh
    * [[run]]/[[writeBatch]] stream (new `path`, new checkpoint, the new
    * centroids) resumes incremental maintenance on top.
    *
    * `prefix` should be VERSIONED by the caller (`myindex_v2`):
    * [[graft.operators.ScaleJoins.writeBucketed]] drops and rewrites
    * the catalog tables non-atomically, so rebuilding in place would
    * expose a missing-table window to concurrent probes — write the
    * next version, then swap readers, then drop the old (the
    * [[graft.operators.Dedup.compactBandIndex]] catalog-swap note).
    * Returns the (centroids, lists) table names.
    */
  def rebuildIndex(spark: SparkSession, path: String,
                   newCentroids: DataFrame, prefix: String,
                   buckets: Int,
                   basePrefix: Option[String] = None): (String, String) =
    basePrefix match {
      case None =>
        // standalone-tree fold (the original contract: the streamed
        // tree IS the whole corpus)
        Similarity.writeIvfIndex(
          lists(spark, path).select(col("cand_id"), col("cv")),
          newCentroids, prefix, buckets)
      case Some(bp) =>
        // full-corpus retrain over base ∪ streamed (the
        // StreamingPostingsIndex.rebuildIndex twin — folding only the
        // streamed tree would silently drop every surviving BASE vector
        // at the catalog swap): the pinned tombstone SNAPSHOT filters
        // both sides (one delete state by construction; the single
        // lists-write job needs no corpus-scale checkpoint), and
        // deletes recorded after the snapshot carry forward to the new
        // prefix (re-run carryForward after the reader swap for the
        // residual window, see its scaladoc). The old prefix's
        // tombstone table stays for its readers until the swap.
        import graft.operators.Tombstones
        val snap = Tombstones.snapshot(spark, bp)
        val base = spark.table(s"${bp}_lists")
          .select(col("cand_id"), col("cv"))
        val streamed = lists(spark, path, base,
            spark.table(s"${bp}_centroids"))
          .select(col("cand_id"), col("cv"))
        val kept = Tombstones.filterWith(
          base.unionByName(streamed), snap, "cand_id")
        val out = Similarity.writeIvfIndex(kept, newCentroids, prefix,
          buckets)
        Tombstones.carryForward(spark, bp, prefix, snap)
        snap.foreach(graft.operators.Checkpoints.release)
        out
    }

  /** [[lists]] with the pre-commit schema DERIVED instead of assumed:
    * `template` is any batch frame shaped like the stream's
    * micro-batches (`(cand_id, cv)` — an empty slice is fine), and the
    * empty index is built by running the exact [[writeBatch]]
    * expressions over its empty head, so the pre- and post-commit
    * schemas agree by construction for any id/vector/cell types.
    */
  def lists(spark: SparkSession, path: String,
            template: DataFrame, centroids: DataFrame): DataFrame =
    if (StreamingBatchDirs.exists(spark, path))
      spark.read.parquet(path).drop("batch")
    else
      Similarity.ivfAssign(template.limit(0), "cv", "cand_id", centroids)
        .withColumn("_cn", graft.functions.GraftFunctions.l2norm(col("cv")))
}
