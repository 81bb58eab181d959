package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.GraftFunctions.hash64

/** The streaming curation chain — the four incremental-maintenance
  * pieces composed into ONE per-batch pipeline, the continuous form of
  * the batch curation funnel:
  *
  *  1. [[StreamingContentDedup]] gates the batch (intra-batch + against
  *     the on-disk band index) and lands the admitted documents under
  *     `keptDir/batch=<id>`;
  *  2. [[StreamingCardStats]] writes the dataset-card partials OF THE
  *     ADMITTED documents (read back from the kept store — the single
  *     source of truth — and re-joined to the batch's source/lang);
  *  3. [[StreamingVectorIndex]] appends the admitted documents'
  *     embeddings to the IVF lists under `indexDir/batch=<id>`;
  *  4. [[StreamingPostingsIndex]] appends the admitted documents'
  *     BM25 postings under `postingsDir/batch=<id>` — the curated
  *     corpus stays lexically searchable as it grows.
  *
  * Batch-atomic consistency across the four artifacts: the streaming
  * checkpoint commits only after the WHOLE chain returns, so a crash at
  * any point replays the batch from stage 1; every stage is idempotent
  * per batch (kept/card/index/postings overwrite their own `batch=<id>`
  * partition; the band-index append is replay-safe because the probe
  * excludes same-id matches), and stages 2–4 derive from the stage-1
  * artifact rather than the raw batch — so after the replay all four
  * artifacts describe exactly the admitted documents of batches 0..N,
  * once each, no matter where the crash fell. Same recovery discipline
  * as [[graft.operators.Compaction.compactBatchTree]]: decide from what
  * committed, never from what was attempted.
  *
  * Per-batch cost scales with the batch (the [[StreamingContentDedup]]
  * contract); nothing here re-reads the corpus.
  */
object StreamingCurationChain {

  /** Deterministic hash-projection text embedding — the STAND-IN for a
    * model encoder (inference is out of scope, the
    * `pipeline.UdfExtractor` precedent): `dims` pseudo-random unit-scale
    * components derived from the text, so the vector-index stage runs
    * real plumbing on real columns. Swap for a model UDF at the same
    * seam.
    */
  def textEmbedding(text: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)), d =>
      (hash64(concat(text, lit(":"), d.cast("string")), 7) % 1000)
        .cast("double") / 1000.0)

  /** One batch through the whole chain. `onStage(batchId, k)` fires
    * after stage k commits — an observability/test seam (the crash spec
    * injects failures between stages through it).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, prefix: String,
                   keptDir: String, cardDir: String, indexDir: String,
                   postingsDir: String, centroids: DataFrame, batchId: Long,
                   jaccardMin: Double = 0.5, buckets: Int = 8,
                   dims: Int = 8,
                   onStage: (Long, Int) => Unit = (_, _) => ()): Unit = {
    StreamingContentDedup.processBatch(spark,
      batch.select(col("doc_id"), col("text")), prefix,
      s"$keptDir/batch=$batchId", jaccardMin, buckets)
    // enrich the kept partition with (lang, source) IN PLACE: stages
    // 2-4 and — crucially — the [[deleteDocs]] takedown path must be
    // able to regenerate every derived artifact from the kept store
    // alone (at takedown time the raw batch no longer exists). Pinned
    // before the overwrite (read-what-you-replace), idempotent on
    // replay like every other per-batch write.
    val kept = graft.operators.Checkpoints.pin(
      spark.read.parquet(s"$keptDir/batch=$batchId")
        .join(batch.select(col("doc_id"), col("lang"), col("source")),
          Seq("doc_id")))
    kept.write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
    onStage(batchId, 1)
    StreamingCardStats.writeBatch(kept, cardDir, batchId)
    onStage(batchId, 2)
    StreamingVectorIndex.writeBatch(
      kept.select(col("doc_id").as("cand_id"),
        textEmbedding(col("text"), dims).as("cv")),
      centroids, indexDir, batchId)
    onStage(batchId, 3)
    StreamingPostingsIndex.writeBatch(
      kept.select(col("doc_id"), col("text")), "doc_id", "text",
      postingsDir, batchId)
    onStage(batchId, 4)
  }

  /** Takedown: propagate the deletion of `ids` (a one-column `doc_id`
    * frame) through ALL five chain artifacts — the GDPR/licensing path
    * a production curation pipeline cannot ship without.
    *
    *  - The band index takes a [[graft.operators.Tombstones]] marker
    *    FIRST (durable intent before any mutation): probes exclude the
    *    documents immediately (broadcast anti-join),
    *    [[graft.operators.Dedup.compactBandIndex]] purges physically —
    *    so a future equivalent document is ADMITTED again, exactly the
    *    semantics a takedown implies.
    *  - The kept store, vector lists and postings trees are row-level
    *    and id-keyed, so each rewrites ITS OWN affected `batch=<id>`
    *    partitions by an anti-join on the ids — no correspondence with
    *    the kept tree's partitioning is assumed, which makes the purge
    *    robust to [[graft.operators.Compaction.compactBatchTree]] folds
    *    having merged any of the trees independently.
    *  - The card partials carry NO document ids (they are (source,
    *    lang) sums), so they cannot be filtered: the card tree REBUILDS
    *    from the post-delete kept store — one partial per current kept
    *    partition, stale card partitions (ids no longer in the kept
    *    tree, e.g. after an independent fold) deleted. The rebuild runs
    *    UNCONDITIONALLY: a crashed earlier delete leaves no marker
    *    saying whether the card was corrected, and one kept-store scan
    *    per takedown (a rare event) is the price of a recovery story
    *    with no such marker.
    *
    * Idempotent and crash-recoverable by re-running with the same ids:
    * every step is a pure filter or a recomputation from current state,
    * and the card rebuild — the only step whose staleness is invisible
    * — always runs. Run against a quiesced stream (or accept that a
    * batch committing concurrently is not covered — re-issue the
    * delete afterwards).
    */
  def deleteDocs(spark: SparkSession, ids: DataFrame, prefix: String,
                 keptDir: String, cardDir: String, indexDir: String,
                 postingsDir: String): Unit = {
    import graft.operators.{Checkpoints, Tombstones}
    val del = Checkpoints.pin(ids.select(col("doc_id")).distinct())
    Tombstones.write(spark, prefix, del, "doc_id")
    def purge(dir: String, idCol: String): Unit =
      for (b <- StreamingBatchDirs.list(spark, dir)) {
        val path = s"$dir/batch=$b"
        val part = spark.read.parquet(path)
        val cond = part(idCol) === del("doc_id")
        if (!part.join(del, cond, "left_semi").isEmpty) {
          val rest = Checkpoints.pin(part.join(del, cond, "left_anti"))
          rest.write.mode("overwrite").parquet(path)
        }
      }
    purge(indexDir, "cand_id")
    purge(postingsDir, "doc_id")
    purge(keptDir, "doc_id")
    val keptBatches = StreamingBatchDirs.list(spark, keptDir)
    for (b <- keptBatches)
      StreamingCardStats.writeBatch(
        spark.read.parquet(s"$keptDir/batch=$b"), cardDir, b)
    for (b <- StreamingBatchDirs.list(spark, cardDir).toSet -- keptBatches)
      StreamingBatchDirs.deletePartition(spark, cardDir, b)
  }

  /** Start the chain on a streaming `(doc_id, text, lang, source)`
    * source with a FROZEN coarse quantizer (the
    * [[StreamingVectorIndex]] contract).
    */
  def start(source: DataFrame, prefix: String, keptDir: String,
            cardDir: String, indexDir: String, postingsDir: String,
            centroids: DataFrame,
            checkpoint: String, jaccardMin: Double = 0.5, buckets: Int = 8,
            dims: Int = 8,
            onStage: (Long, Int) => Unit = (_, _) => ()): StreamingQuery = {
    StreamingContentDedup.bootstrapIndex(source.sparkSession, prefix, buckets)
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, prefix, keptDir, cardDir,
          indexDir, postingsDir, centroids, batchId, jaccardMin, buckets,
          dims, onStage)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
