package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** Streaming BM25 postings maintenance — the lexical-index member of
  * the incremental family (vector index: [[StreamingVectorIndex]];
  * band index: [[StreamingContentDedup]]): each micro-batch of new
  * documents tokenizes into postings rows `(id, len, term, tf)` under
  * `batch=<id>`, and probes answer from the base index's postings ∪
  * every committed batch through the unchanged
  * [[Retrieval.probePostings]] arithmetic.
  *
  * The FROZEN-STATS contract mirrors the frozen quantizer (and is how
  * segment-based search engines behave between merges): per-term idf
  * and the corpus avgdl stay pinned to the base index's terms table,
  * because refreshing them per batch would re-score every existing
  * posting — the cost this maintenance scheme exists to avoid. New
  * documents are visible immediately under the stale statistics; a
  * term unseen at build time has no idf row and does not score until
  * [[rebuildIndex]] — the retrain-time refresh that folds base +
  * streamed segments into a fresh [[Retrieval.writeBm25Index]]-shaped
  * index, bit-identical to rebuilding from the concatenated raw
  * corpus (postings carry enough to re-derive every statistic).
  *
  * Replay safety: each batch overwrites its own `batch=<id>` partition
  * (at-least-once foreachBatch cannot double-insert);
  * [[graft.operators.Compaction.compactBatchTree]] folds committed
  * partitions when the batch count grows.
  */
object StreamingPostingsIndex {

  /** Start the maintenance query over a streaming frame carrying
    * `(idCol, textCol)`: per micro-batch, tokenize and persist the
    * postings rows under `path/batch=<id>`.
    */
  def run(stream: DataFrame, idCol: String, textCol: String, path: String,
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, idCol, textCol, path, batchId)
      }
      .start()

  /** One batch's postings rows — idempotent per `batchId`. */
  def writeBatch(batch: DataFrame, idCol: String, textCol: String,
                 path: String, batchId: Long): Unit =
    Retrieval.tfPostings(batch, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The streamed postings: the union of all persisted batches, in the
    * exact `(idCol, len, term, tf)` shape [[Retrieval.probePostings]]
    * consumes. Reads as the empty segment before any batch commits —
    * schema derived by running the [[writeBatch]] expressions over an
    * empty slice of `template` (any frame shaped like the stream's
    * micro-batches), so pre- and post-commit schemas agree by
    * construction for any id type.
    */
  def postings(spark: SparkSession, path: String, template: DataFrame,
               idCol: String, textCol: String): DataFrame =
    if (StreamingBatchDirs.exists(spark, path))
      spark.read.parquet(path).drop("batch")
    else Retrieval.tfPostings(template.limit(0), idCol, textCol)

  /** BM25 top-k over base index ∪ streamed segments under the
    * frozen-stats contract: postings union, terms table (idf/avgdl)
    * pinned to the base index. Deletes recorded against `basePrefix`
    * ([[graft.operators.Tombstones]]) filter the WHOLE union — base
    * rows and streamed segments alike — so the live view honors a
    * takedown exactly like [[Retrieval.probeBm25Index]] does on the
    * base index alone.
    */
  def probeLive(spark: SparkSession, basePrefix: String, path: String,
                template: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, k: Int,
                k1: Double = 1.2, b: Double = 0.75): DataFrame =
    Retrieval.probePostings(
      graft.operators.Tombstones.filter(spark, basePrefix,
        spark.table(s"${basePrefix}_postings")
          .unionByName(postings(spark, path, template, idCol, textCol)),
        idCol),
      spark.table(s"${basePrefix}_terms"), idCol, queries, k, k1, b)

  /** Retrain-time refresh: fold the base index's postings and every
    * committed streamed segment into a fresh index under `newPrefix`,
    * re-deriving df/idf/avgdl from the combined postings
    * ([[Retrieval.writeBm25IndexFromPostings]] — bit-identical to
    * building from the concatenated raw corpus, no re-tokenize).
    * `newPrefix` must be a NEW version (`myindex_v2`): the bucketed
    * writes drop-and-rewrite non-atomically, so rebuilding in place
    * would expose a missing-table window to concurrent probes (the
    * [[StreamingVectorIndex.rebuildIndex]] catalog-swap note). A fresh
    * [[run]] (new path, new checkpoint) resumes maintenance on top.
    */
  def rebuildIndex(spark: SparkSession, basePrefix: String, path: String,
                   template: DataFrame, idCol: String, textCol: String,
                   newPrefix: String, buckets: Int): (String, String) = {
    import graft.operators.Tombstones
    // lost-delete protocol (the compactBm25Index discipline adapted to
    // a VERSION swap): filter with a tombstone SNAPSHOT — the pinned
    // snapshot itself is what makes the postings and terms write jobs
    // see one delete state (the base table is immutable during the
    // rebuild and the batch tree's file listing is fixed when the
    // frame is created, so NO corpus-scale checkpoint is needed — the
    // measured writeBm25IndexFromPostings lesson) — then carry any
    // tombstone recorded after the snapshot forward to the new prefix,
    // where probeBm25Index keeps filtering it (re-run carryForward
    // after the reader swap for the residual window, see its scaladoc).
    // The base tombstone table intentionally stays: readers of the OLD
    // prefix need it until the swap.
    val snap = Tombstones.snapshot(spark, basePrefix)
    val kept = Tombstones.filterWith(
      spark.table(s"${basePrefix}_postings")
        .unionByName(postings(spark, path, template, idCol, textCol)),
      snap, idCol)
    val out = Retrieval.writeBm25IndexFromPostings(kept, idCol, newPrefix,
      buckets)
    Tombstones.carryForward(spark, basePrefix, newPrefix, snap)
    snap.foreach(graft.operators.Checkpoints.release)
    out
  }
}
