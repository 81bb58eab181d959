package graft.streaming

import org.apache.hadoop.fs.Path

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
  *     corpus stays lexically searchable as it grows;
  *  5. (when `maxSegments` > 0) [[maintain]] applies the compaction
  *     policy: batch trees fold once they exceed the segment bound,
  *     and pending tombstones are physically purged from the band
  *     index and retired — a long-running stream stays bounded with
  *     no operator remembering to run maintenance.
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
    * injects failures between stages through it). `maxSegments` > 0
    * turns on the stage-5 [[maintain]] policy.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, prefix: String,
                   keptDir: String, cardDir: String, indexDir: String,
                   postingsDir: String, centroids: DataFrame, batchId: Long,
                   jaccardMin: Double = 0.5, buckets: Int = 8,
                   dims: Int = 8, maxSegments: Int = 0,
                   onStage: (Long, Int) => Unit = (_, _) => ()): Unit = {
    import graft.operators.Tombstones
    // honor tombstones at batch ENTRY: a deleted doc id that re-arrives
    // (at-least-once redelivery, or a takedown racing this batch's
    // replay) must not re-enter any artifact — without the operator
    // having to re-issue the delete. The snapshot is taken once per
    // batch; a tombstone landing AFTER it can still commit with this
    // batch physically, but stays invisible to every probe path (the
    // band probe, the vector and postings live views all filter), and
    // the next deleteDocs re-run or stage-5 compaction purges it — the
    // residual race is one batch wide, not "quiesce the stream".
    val live = Tombstones.filterWith(batch,
      Tombstones.snapshot(spark, prefix), "doc_id")
    StreamingContentDedup.processBatch(spark,
      live.select(col("doc_id"), col("text")), prefix,
      s"$keptDir/batch=$batchId", jaccardMin, buckets)
    // enrich the kept partition with (lang, source) IN PLACE: stages
    // 2-4 and — crucially — the [[deleteDocs]] takedown path must be
    // able to regenerate every derived artifact from the kept store
    // alone (at takedown time the raw batch no longer exists). Pinned
    // before the overwrite (read-what-you-replace), idempotent on
    // replay like every other per-batch write.
    val kept = graft.operators.Checkpoints.pin(
      spark.read.parquet(s"$keptDir/batch=$batchId")
        .join(live.select(col("doc_id"), col("lang"), col("source")),
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
    if (maxSegments > 0) {
      maintain(spark, prefix, Seq(keptDir, cardDir, indexDir, postingsDir),
        maxSegments, buckets)
      onStage(batchId, 5)
    }
  }

  /** Stage-5 maintenance policy: fold any batch tree that exceeds
    * `maxSegments` committed partitions
    * ([[graft.operators.Compaction.maybeCompactBatchTree]] — the fold
    * keeps the newest partition replayable, so running INSIDE
    * foreachBatch before the checkpoint commit is safe), and when a
    * takedown left tombstones pending, physically purge them from the
    * band index and retire the markers
    * ([[graft.operators.Dedup.compactBandIndex]]'s snapshot/retire
    * protocol — a delete landing during the rewrite survives). The
    * row-level trees were already purged by [[deleteDocs]]; the band
    * index is the one artifact that defers its physical delete, so a
    * delete wave fully settles within one batch of being issued.
    */
  def maintain(spark: SparkSession, prefix: String, trees: Seq[String],
               maxSegments: Int, buckets: Int): Unit = {
    import graft.operators.{Compaction, Dedup, Tombstones}
    trees.foreach(d => Compaction.maybeCompactBatchTree(spark, d, maxSegments))
    if (Tombstones.read(spark, prefix).isDefined)
      Dedup.compactBandIndex(spark, prefix, buckets)
  }

  /** Takedown: propagate the deletion of `ids` (a one-column `doc_id`
    * frame) through ALL five chain artifacts — the GDPR/licensing path
    * a production curation pipeline cannot ship without. Returns the
    * affected batch ids per row-level tree (exactly the partitions that
    * were rewritten — the at-scale contract the spec pins).
    *
    *  - The band index takes a [[graft.operators.Tombstones]] marker
    *    FIRST (durable intent before any mutation): probes exclude the
    *    documents immediately (broadcast anti-join),
    *    [[graft.operators.Dedup.compactBandIndex]] purges physically —
    *    so a future equivalent document is ADMITTED again, exactly the
    *    semantics a takedown implies.
    *  - The kept store, vector lists and postings trees are row-level
    *    and id-keyed, so each discovers its affected `batch=<id>`
    *    partitions with ONE semi-join over the whole tree (the batch id
    *    rides in as the partition column) and rewrites ONLY those via a
    *    staged atomic swap — O(affected) driver jobs, not O(batches)
    *    probe jobs, and a crash mid-rewrite can never lose a
    *    partition's surviving rows ([[rewritePartition]]). No
    *    correspondence between the trees' partitionings is assumed,
    *    which makes the purge robust to
    *    [[graft.operators.Compaction.compactBatchTree]] folds having
    *    merged any of the trees independently.
    *  - The card partials carry NO document ids (they are (source,
    *    lang) sums), so they cannot be filtered: the card tree REBUILDS
    *    from the post-delete kept store in one job, grouped by the kept
    *    batch id so the partition layout keeps mirroring the kept tree
    *    (stale ids from an independent fold disappear with the swap).
    *    The rebuild runs UNCONDITIONALLY: a crashed earlier delete
    *    leaves no marker saying whether the card was corrected, and one
    *    kept-store scan per takedown (a rare event) is the price of a
    *    recovery story with no such marker.
    *
    * Idempotent and crash-recoverable by re-running with the same ids:
    * every step is a pure filter or a recomputation from current state
    * behind a heal-first staged swap, and the card rebuild — the only
    * step whose staleness is invisible — always runs. A batch
    * committing concurrently with the takedown keeps the deleted id
    * physically (this purge saw only committed partitions) but
    * invisibly — its tombstone filters the batch-entry gate and every
    * probe path — until the next deleteDocs re-run or stage-5
    * compaction; see [[processBatch]].
    */
  def deleteDocs(spark: SparkSession, ids: DataFrame, prefix: String,
                 keptDir: String, cardDir: String, indexDir: String,
                 postingsDir: String): Map[String, Seq[Long]] = {
    import graft.operators.{Checkpoints, Tombstones}
    val del = Checkpoints.pin(ids.select(col("doc_id")).distinct())
    Tombstones.write(spark, prefix, del, "doc_id")
    val affected = Map(
      indexDir -> purgeTree(spark, indexDir, "cand_id", del),
      postingsDir -> purgeTree(spark, postingsDir, "doc_id", del),
      keptDir -> purgeTree(spark, keptDir, "doc_id", del))
    rebuildCardTree(spark, keptDir, cardDir)
    affected
  }

  /** The whole `batch=<id>` tree as one frame WITH the batch partition
    * column: a basePath read over exactly the numeric partitions, so
    * foreign dirs are skipped and the takedown can discover its
    * affected partitions in one job instead of probing each.
    */
  private def readTree(spark: SparkSession, dir: String,
                       batches: Seq[Long]): DataFrame =
    spark.read.option("basePath", dir)
      .parquet(batches.map(b => s"$dir/batch=$b"): _*)

  /** Purge `del` from one row-level tree: ONE discovery semi-join over
    * the whole tree (the delete set broadcasts; the distinct collapses
    * to the O(affected) batch-id set), then a staged-swap rewrite of
    * only the affected partitions. Driver job count is O(affected)+1 —
    * a long-running pre-compaction stream has thousands of segments,
    * and a takedown touching one of them must not cost thousands of
    * sequential probe jobs to find out. Returns the affected ids.
    */
  private def purgeTree(spark: SparkSession, dir: String, idCol: String,
                        del: DataFrame): Seq[Long] = {
    healSwaps(spark, dir)
    val batches = StreamingBatchDirs.list(spark, dir)
    if (batches.isEmpty) return Seq.empty
    val tree = readTree(spark, dir, batches)
    val affected = tree
      .join(broadcast(del), tree(idCol) === del("doc_id"), "left_semi")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    affected.foreach(b => rewritePartition(spark, dir, b, idCol, del))
    affected
  }

  /** Rewrite `dir/batch=<b>` without the delete set via the staged
    * atomic swap (the [[graft.operators.Compaction]] discipline): an
    * in-place `mode("overwrite")` deletes the old files BEFORE the job
    * commits, so a crash mid-rewrite would permanently lose the
    * partition's surviving rows — and for the kept store the raw batch
    * no longer exists to recover them from. The dot-prefixed
    * staging/held names are invisible to partition discovery;
    * [[healSwaps]] completes or rolls back a torn swap before the next
    * purge touches the tree.
    */
  private def rewritePartition(spark: SparkSession, dir: String, b: Long,
                               idCol: String, del: DataFrame): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$dir/batch=$b")
    val staging = new Path(s"$dir/.batch=$b._staging")
    val held = new Path(s"$dir/.batch=$b._old")
    if (fs.exists(staging)) fs.delete(staging, true)
    val part = spark.read.parquet(target.toString)
    part.join(broadcast(del), part(idCol) === del("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(held)) fs.delete(held, true)
    require(fs.rename(target, held), s"rename $target aside failed")
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    fs.delete(held, true)
  }

  /** Complete or roll back swaps a crashed [[rewritePartition]] left
    * torn: a stale staging is an incomplete rewrite (its source is
    * intact — drop it and redo); a held copy NEXT TO a committed target
    * is the pre-delete original (drop it); a held copy ALONE means the
    * crash fell between the two renames and it is the only copy —
    * restore it whole (the re-run purge re-applies the delete).
    */
  private def healSwaps(spark: SparkSession, dir: String): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    fs.listStatus(path).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(".batch=") && n.endsWith("._staging"))
        fs.delete(s.getPath, true)
      else if (n.startsWith(".batch=") && n.endsWith("._old")) {
        val target = new Path(path, n.stripPrefix(".").stripSuffix("._old"))
        if (fs.exists(target)) fs.delete(s.getPath, true)
        else require(fs.rename(s.getPath, target), s"restore $target failed")
      }
    }
  }

  /** Rebuild the card tree from the post-delete kept store in ONE job
    * (plus renames): partials grouped by the kept batch id, written
    * `partitionBy("batch")` to a staging tree, swapped in atomically —
    * not one write job per kept batch. A kept partition emptied by the
    * delete produces no card group, so its empty partial is written
    * after the swap (O(emptied) tiny jobs) to keep the card tree
    * mirroring the kept tree partition-for-partition.
    */
  private def rebuildCardTree(spark: SparkSession, keptDir: String,
                              cardDir: String): Unit = {
    val path = new Path(cardDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val held = new Path(cardDir + "._rebuild_old")
    // heal a torn earlier swap: the held copy alone is the only copy
    if (fs.exists(held)) {
      if (!fs.exists(path)) require(fs.rename(held, path),
        s"restore $path failed")
      else fs.delete(held, true)
    }
    val staging = new Path(cardDir + "._rebuild_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    val keptBatches = StreamingBatchDirs.list(spark, keptDir)
    if (keptBatches.isEmpty) {
      if (fs.exists(path)) fs.delete(path, true)
      return
    }
    val kept = readTree(spark, keptDir, keptBatches)
    StreamingCardStats.partialsKeyed(kept, Seq("batch"))
      .write.mode("overwrite").partitionBy("batch")
      .parquet(staging.toString)
    if (fs.exists(path))
      require(fs.rename(path, held), s"rename $path aside failed")
    require(fs.rename(staging, path), s"rename $staging -> $path failed")
    fs.delete(held, true)
    val cardBatches = StreamingBatchDirs.list(spark, cardDir).toSet
    for (b <- keptBatches.filterNot(cardBatches))
      StreamingCardStats.writeBatch(
        kept.filter(lit(false)).drop("batch"), cardDir, b)
  }

  /** Start the chain on a streaming `(doc_id, text, lang, source)`
    * source with a FROZEN coarse quantizer (the
    * [[StreamingVectorIndex]] contract). `maxSegments` > 0 enables the
    * per-batch [[maintain]] policy.
    */
  def start(source: DataFrame, prefix: String, keptDir: String,
            cardDir: String, indexDir: String, postingsDir: String,
            centroids: DataFrame,
            checkpoint: String, jaccardMin: Double = 0.5, buckets: Int = 8,
            dims: Int = 8, maxSegments: Int = 0,
            onStage: (Long, Int) => Unit = (_, _) => ()): StreamingQuery = {
    StreamingContentDedup.bootstrapIndex(source.sparkSession, prefix, buckets)
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, prefix, keptDir, cardDir,
          indexDir, postingsDir, centroids, batchId, jaccardMin, buckets,
          dims, maxSegments, onStage)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
