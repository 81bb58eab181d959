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
  *  0. (when a `gate` is configured) the DECONTAMINATION gate refuses
  *     documents matching the frozen benchmark at any rung of the
  *     leakage ladder ([[graft.operators.Contamination.gateBatch]]) —
  *     a leaked test item never enters any artifact;
  *  0.5 (when a [[LineCuration]] is configured) boilerplate lines are
  *     scrubbed against a FROZEN banned-line pool and within-document
  *     repeated lines removed — before fingerprinting, so near-dup
  *     detection sees content, not nav chrome;
  *  0.75 (when a [[SemanticDedup]] is configured) the batch is gated
  *     against the chain's OWN vector index
  *     ([[StreamingSemanticDedup]]) — a document within tau cosine of
  *     an admitted document (or a smaller-id batch-mate) is refused,
  *     so the chain dedups lexically AND semantically with one set of
  *     artifacts;
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
  *     and pending tombstones are physically purged from EVERY
  *     artifact — row-level trees first, then the band index — and
  *     staged for a deferred retire, so a long-running stream stays
  *     bounded with no operator remembering to run maintenance.
  *
  * Batch-atomic consistency across the four artifacts: the streaming
  * checkpoint commits only after the WHOLE chain returns, so a crash at
  * any point replays the batch from stage 1; every stage is idempotent
  * per batch (kept/card/index/postings overwrite their own `batch=<id>`
  * partition; the band-index append is replay-safe because the probe
  * excludes same-id matches), and stages 2–4 derive from the stage-1
  * artifact rather than the raw batch — so after the replay all four
  * artifacts describe exactly the admitted documents of batches 0..N,
  * once each, no matter where the crash fell. Tombstone marker RETIRES
  * are kept replay-deterministic by deferral: stage 5 only STAGES the
  * applied snapshot ([[graft.operators.Tombstones.stageRetire]]); the
  * actual retire runs at the START of a strictly later batch — whose
  * existence proves this batch's checkpoint committed — so a replayed
  * batch always sees the same marker state its first attempt saw. Same
  * recovery discipline as
  * [[graft.operators.Compaction.compactBatchTree]]: decide from what
  * committed, never from what was attempted.
  *
  * Per-batch cost scales with the batch (the [[StreamingContentDedup]]
  * contract); nothing here re-reads the corpus outside a pending
  * takedown's O(affected) purge.
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

  /** Frozen line-curation config for the chain: `pool` is a PINNED
    * [[graft.operators.TextAnalysis.boilerplateLinePool]] relation
    * (one `lh` column, derived ONCE from a reference corpus at stream
    * start — per-batch document frequency would be both replay-unsafe
    * across code changes and semantically wrong, a batch is not the
    * corpus); `dedupWithin` additionally removes within-document
    * repeated lines. Both rewrites are deterministic against the
    * frozen pool, hence replay-safe like the gate.
    */
  case class LineCuration(pool: DataFrame, sep: String = "\n",
                          dedupWithin: Boolean = true)

  /** Semantic-dedup config for the chain ([[StreamingSemanticDedup]]):
    * documents within `tau` cosine of an already-admitted document (or
    * of a smaller-id batch-mate) are refused before any artifact sees
    * them — probed against the chain's OWN vector index, so admitting
    * and dedup share one structure. `embed` overrides the
    * [[textEmbedding]] stand-in for BOTH the gate and the stage-3
    * index append (they must agree, or the index would not describe
    * the vectors the gate probes).
    *
    * `extraFamilies` is the recall dial past nprobe saturation
    * ([[StreamingSemanticDedup.gateBatchMulti]]): each entry is an
    * EXTRA frozen quantizer (its centroids, trained with an
    * independent seed) and the path its own index tree lives under —
    * a SIBLING directory of the chain's `indexDir`, never inside it
    * (a `family=` subdir would corrupt the main tree's partition
    * discovery). The chain probes every family per batch, drops under
    * ANY, and stage 3 appends each admitted batch to EVERY family's
    * tree, so all trees describe the same admitted corpus under
    * different cell geometries. Takedowns purge the extra trees too —
    * pass the same paths to [[deleteDocs]]' `extraIndexDirs` (and the
    * chain's own stage-5 maintenance covers them automatically).
    */
  case class SemanticDedup(tau: Double, nprobe: Int = 1,
                           embed: Option[Column => Column] = None,
                           extraFamilies: Seq[(DataFrame, String)] = Nil)

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
                   gate: Option[graft.operators.Contamination.BenchmarkGate] = None,
                   lineCuration: Option[LineCuration] = None,
                   semanticDedup: Option[SemanticDedup] = None,
                   onStage: (Long, Int) => Unit = (_, _) => ()): Unit = {
    import graft.operators.{Checkpoints, Contamination, Tombstones}
    // Deferred-retire epilogue for an EARLIER batch's stage-5
    // compaction: markers staged at batch b retire only here, at a
    // batch > b — b's checkpoint has committed, so b can never replay
    // and re-admit through an empty entry gate. Running BEFORE this
    // batch's own entry snapshot keeps replay deterministic: a crash
    // replaying THIS batch finds the identical (already-retired)
    // marker state its first attempt saw.
    Tombstones.retirePending(spark, prefix, beforeBatch = batchId)
    // honor tombstones at batch ENTRY: a deleted doc id that re-arrives
    // (at-least-once redelivery, or a takedown racing this batch's
    // replay) must not re-enter any artifact — without the operator
    // having to re-issue the delete. The snapshot is taken once per
    // batch; a tombstone landing AFTER it can still commit with this
    // batch physically, but stays invisible to every probe path (the
    // band probe, the vector and postings live views all filter), and
    // the next deleteDocs re-run or stage-5 maintenance purges it — the
    // residual race is one batch wide, not "quiesce the stream".
    val entrySnap = Tombstones.snapshot(spark, prefix)
    val tombFree = Tombstones.filterWith(batch, entrySnap, "doc_id")
    // optional DECONTAMINATION gate before any artifact sees the batch:
    // every rung of the leakage ladder probes the FROZEN benchmark
    // structures ([[graft.operators.Contamination.gateBatch]] — pinned
    // at stream start, broadcast per batch, never rebuilt), so a leaked
    // test item arriving on the stream is refused at the door instead
    // of being admitted and needing a takedown later. With
    // `gate.excise` the gate runs GATE-THEN-EXCISE: rungs 1-3 refuse
    // whole-document leaks, then embedded benchmark quotes are removed
    // from the survivors' text (a quoting host is admitted cleaned
    // instead of rung 4 dropping it). Both forms are deterministic
    // against frozen probes, hence replay-safe like the tombstone
    // filter above.
    val (gated, gateRelease) = gate.fold(
        (tombFree, () => ())) { g =>
      Contamination.gateBatchReleasable(
        tombFree, g.probes, "doc_id", "text", g.vec, g.minOverlapFrac,
        g.minJaccard, g.minCos, g.minCoverage, g.excise, g.minKeepTokens,
        g.exciseFixpoint)
    }
    // optional LINE CURATION between the gate and dedup: boilerplate
    // lines (frozen pool, never a per-batch frequency pass) and
    // within-doc repeats are stripped BEFORE fingerprinting, so two
    // documents differing only in nav chrome dedup as the same content
    // — scrub-then-dedup, the order that makes the band index describe
    // the text the corpus actually keeps
    val curated = lineCuration.fold(gated) { lc =>
      import graft.operators.TextAnalysis
      val scrubbed = TextAnalysis.scrubBoilerplateLinesWithPool(
        gated, lc.pool, "doc_id", "text", lc.sep).drop("n_scrubbed")
      if (lc.dedupWithin)
        scrubbed.withColumn("text",
          TextAnalysis.dedupLines(col("text"), lc.sep))
      else scrubbed
    }
    // the embedding used by BOTH the semantic gate and stage 3 — one
    // function, or the index would not describe what the gate probes
    val embedFn: Column => Column =
      semanticDedup.flatMap(_.embed)
        .getOrElse(textEmbedding(_: Column, dims))
    // optional SEMANTIC dedup before any artifact sees the batch: the
    // chain's own vector index is the dedup structure
    // ([[StreamingSemanticDedup]] — replay-safe against the crashed
    // attempt's own partition, tombstone-aware via the entry snapshot)
    // NOT pinned before the semantic gate, on measurement: the gate
    // references `curated` ~4x (probe assign, self-lists assign, two
    // anti-joins), but a second per-batch pin here measured NO reliable
    // steady-state gain over the single post-gate pin below (14-21 s vs
    // 16-17.5 s across runs, inside host noise) while the extra eager
    // materialization job made COLD batches 2-3x slower (34-49 s vs
    // ~17 s) — the one pin after the full pre-dedup lineage is the
    // measured shape (BASELINE.md round-16; the semDedupHier
    // no-cache precedent)
    val gatedLive = semanticDedup.fold(curated) { sd =>
      StreamingSemanticDedup.gateBatchMulti(spark,
        curated.withColumn("_cv", embedFn(col("text"))), "doc_id", "_cv",
        StreamingSemanticDedup.QuantizerFamily(centroids, indexDir) +:
          sd.extraFamilies.map { case (c, p) =>
            StreamingSemanticDedup.QuantizerFamily(c, p) },
        sd.tau, sd.nprobe, entrySnap).drop("_cv")
    }
    // pin the gated batch ONCE when any pre-dedup stage is configured:
    // the dedup pass and the kept-store (lang, source) enrichment both
    // consume `live`, and without the pin each consumer re-runs — and
    // separately codegens — the whole gate -> line-curation -> semantic
    // lineage (measured on 5k-doc soak batches with all stages on:
    // ~40 s/batch -> ~17 s/batch pinned, and the first-batch codegen
    // cost falls 58 s -> 17 s; admitted sets byte-identical —
    // BASELINE.md round-16; batch-sized, released in the finally)
    val livePinned = gate.nonEmpty || lineCuration.nonEmpty ||
      semanticDedup.nonEmpty
    var live: DataFrame = null
    var kept: DataFrame = null
    try {
      // the pin JOB runs the whole gate → curation → semantic lineage —
      // inside the try, so a failure DURING the pin still reaches the
      // finally's gateRelease() and the gate's excise pins never fall
      // back to GC-driven cleanup (the accumulation this release exists
      // to prevent)
      live = if (livePinned) Checkpoints.pin(gatedLive) else gatedLive
      StreamingContentDedup.processBatch(spark,
        live.select(col("doc_id"), col("text")), prefix,
        s"$keptDir/batch=$batchId", jaccardMin, buckets)
      // enrich the kept partition with (lang, source) IN PLACE: stages
      // 2-4 and — crucially — the [[deleteDocs]] takedown path must be
      // able to regenerate every derived artifact from the kept store
      // alone (at takedown time the raw batch no longer exists). Pinned
      // before the overwrite (read-what-you-replace), idempotent on
      // replay like every other per-batch write.
      kept = graft.operators.Checkpoints.pin(
        spark.read.parquet(s"$keptDir/batch=$batchId")
          .join(live.select(col("doc_id"), col("lang"), col("source")),
            Seq("doc_id")))
      kept.write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
      onStage(batchId, 1)
      StreamingCardStats.writeBatch(kept, cardDir, batchId)
      onStage(batchId, 2)
      val keptVecs = kept.select(col("doc_id").as("cand_id"),
        embedFn(col("text")).as("cv"))
      StreamingVectorIndex.writeBatch(keptVecs, centroids, indexDir, batchId)
      // every EXTRA quantizer family's tree gets the same admitted
      // vectors under ITS centroids — per-batch overwrite, so a crash
      // that reached only some families replays idempotently (and the
      // gate's verdict is replay-identical either way, the
      // gateBatchMulti per-family argument)
      semanticDedup.toSeq.flatMap(_.extraFamilies).foreach {
        case (cents, dir) =>
          StreamingVectorIndex.writeBatch(keptVecs, cents, dir, batchId)
      }
      onStage(batchId, 3)
      StreamingPostingsIndex.writeBatch(
        kept.select(col("doc_id"), col("text")), "doc_id", "text",
        postingsDir, batchId)
      onStage(batchId, 4)
      if (maxSegments > 0) {
        maintain(spark, prefix, keptDir, cardDir, indexDir, postingsDir,
          maxSegments, buckets, batchId,
          semanticDedup.toSeq.flatMap(_.extraFamilies).map(_._2))
        onStage(batchId, 5)
      }
    } finally {
      // release this batch's pins, or a long-running stream accumulates
      // one pinned snapshot + kept frame PER BATCH — localCheckpoint
      // blocks are reclaimed only at rare full GCs, and the BENCH100
      // experiment measured that accumulation compounding into
      // storage-pool pressure (BASELINE.md round-13)
      entrySnap.foreach(Checkpoints.release)
      if (livePinned && live != null) Checkpoints.release(live)
      if (kept != null) Checkpoints.release(kept)
      // the gate's excise-mode pins (matched set / fixpoint state) are
      // batch-sized and fully consumed once `live` materialized — a
      // long-lived stream must not accumulate one per batch
      gateRelease()
    }
  }

  /** Retrain-time refresh for the frozen [[LineCuration]] pool — the
    * maintenance entry the other frozen structures already have (the
    * [[StreamingPostingsIndex.rebuildIndex]] contract applied to
    * boilerplate): a long-lived stream's boilerplate DRIFTS (new site
    * templates arrive after the pool froze), and the frozen pool never
    * learns them. This re-derives
    * [[graft.operators.TextAnalysis.boilerplateLinePool]] from the
    * chain's own kept store — the curated text the corpus actually
    * holds — and returns it PINNED, bit-identical to a fresh
    * derivation over the same kept frames (spec-pinned; every step is
    * a deterministic hash aggregate).
    *
    * Swap semantics, explicit: pass the returned pool as
    * `lineCuration.copy(pool = …)` to the NEXT `processBatch` call —
    * the chain takes the config per batch, so the swap is atomic at a
    * batch boundary by construction (no torn batch can see both
    * pools), and the caller releases the superseded pool's pin
    * ([[graft.operators.Checkpoints.release]]). Documents admitted
    * under the OLD pool are NOT retroactively re-scrubbed: the kept
    * store records what was admitted, and the new pool governs future
    * batches only (the retroactive cleanup is [[retroactiveScrub]], a
    * separate batch job run with the stream stopped — deliberately not
    * hidden in here).
    *
    * Replay safety is inherited, not new: the pool a batch scrubs
    * against is whatever frozen frame its `processBatch` call was
    * handed, so a replayed batch under the same config re-derives the
    * identical admitted set; retraining BETWEEN batches never moves a
    * committed batch's inputs. Returns an empty pool before any batch
    * commits (the [[StreamingPostingsIndex.postings]] empty-segment
    * shape).
    */
  def retrainLinePool(spark: SparkSession, keptDir: String, maxDf: Long,
                      sep: String = "\n"): DataFrame = {
    import graft.operators.{Checkpoints, TextAnalysis}
    val kept =
      if (StreamingBatchDirs.exists(spark, keptDir))
        spark.read.parquet(keptDir)
      else spark.range(0).select(lit("").as("text"))
    Checkpoints.pin(
      TextAnalysis.boilerplateLinePool(kept, "text", maxDf, sep))
  }

  /** The RETROACTIVE half of a [[retrainLinePool]] swap — the batch
    * composition its scaladoc defers: documents admitted under the OLD
    * pool keep their old boilerplate in the kept store and in every
    * derived artifact, and this pass cleans them in place, the
    * takedown discipline (mutate the kept store first, re-derive
    * everything else from surviving kept rows):
    *
    *  1. every kept `batch=<id>` partition is rewritten with the new
    *     pool's scrub ([[graft.operators.TextAnalysis.scrubBoilerplateLinesWithPool]],
    *     plus the within-doc line dedup when `dedupWithin`) via the
    *     staged atomic swap — a crash mid-rewrite never loses a
    *     partition's rows;
    *  2. the card partials, vector lists and BM25 postings of EVERY
    *     kept batch are re-derived from the post-scrub kept partitions
    *     (per-batch overwrite, the replay-idempotent write each stage
    *     already uses) — scrubbing changes text, and text is what all
    *     three describe; derived-tree partitions whose kept batch no
    *     longer exists are then PRUNED (a crash during a maintain's
    *     per-dir compaction — the folds are not atomic across dirs —
    *     can strand one, and a stranded partition would keep its
    *     pre-scrub vectors/postings through the re-derivation
    *     silently);
    *  3. the band index is re-fingerprinted from the scrubbed kept
    *     store ([[StreamingContentDedup.rebuildIndexFrom]]) — nav
    *     chrome lives in the old shingles, and leaving them would keep
    *     refusing future documents for matching boilerplate the corpus
    *     no longer contains.
    *
    * Idempotent under crash/repeat BY RE-RUNNING: the scrub is a
    * fixed point on already-scrubbed text (the pool's lines are gone,
    * so a second pass removes nothing), every step-2/3 write is an
    * idempotent re-derivation from current kept state, and a crash
    * anywhere leaves a state from which the same call completes — the
    * spec crashes between steps and pins that the re-run converges to
    * the never-crashed artifacts. Runs under the
    * [[graft.operators.MaintenanceLock]] with the STREAM STOPPED (it
    * rewrites what a live batch would read); `onStep(k)` fires after
    * step k, the crash-injection seam, and `onFamilyTree(b, f)` fires
    * inside step 2 after batch `b`'s family-`f` vector tree rebuilt
    * (f = 0 the main tree, f = i+1 the i-th extra family) — the
    * FINER seam that lets the spec crash BETWEEN family-tree rebuilds
    * and pin that a re-run plus a gated batch matches the
    * never-crashed universe. `embed`/`dims` must match the
    * chain's config, or step 2's vectors would not describe what the
    * gate probes; `extraFamilies` re-derives each extra quantizer
    * family's tree ([[SemanticDedup.extraFamilies]]).
    */
  def retroactiveScrub(spark: SparkSession, pool: DataFrame, prefix: String,
                       keptDir: String, cardDir: String, indexDir: String,
                       postingsDir: String, centroids: DataFrame,
                       buckets: Int, dims: Int = 8, sep: String = "\n",
                       dedupWithin: Boolean = true,
                       embed: Option[Column => Column] = None,
                       extraFamilies: Seq[(DataFrame, String)] = Nil,
                       onStep: Int => Unit = _ => (),
                       onFamilyTree: (Long, Int) => Unit = (_, _) => ()): Unit = {
    import graft.operators.{MaintenanceLock, TextAnalysis}
    MaintenanceLock.withLock(spark, prefix) {
      healSwaps(spark, keptDir)
      val batches = StreamingBatchDirs.list(spark, keptDir)
      val embedFn: Column => Column =
        embed.getOrElse(textEmbedding(_: Column, dims))
      // 1. scrub every kept partition in place (staged swaps)
      batches.foreach { b =>
        swapInPartition(spark, keptDir, b) { staging =>
          val part = spark.read.parquet(s"$keptDir/batch=$b")
          val scrubbed = TextAnalysis.scrubBoilerplateLinesWithPool(
            part, pool, "doc_id", "text", sep).drop("n_scrubbed")
          val cleaned =
            if (dedupWithin) scrubbed.withColumn("text",
              TextAnalysis.dedupLines(col("text"), sep))
            else scrubbed
          cleaned.write.mode("overwrite").parquet(staging)
        }
        MaintenanceLock.heartbeat(spark, prefix)
      }
      onStep(1)
      // 2. re-derive the per-batch row-level artifacts from the NEW text
      batches.foreach { b =>
        val kept = spark.read.parquet(s"$keptDir/batch=$b")
        StreamingCardStats.writeBatch(kept, cardDir, b)
        val vecs = kept.select(col("doc_id").as("cand_id"),
          embedFn(col("text")).as("cv"))
        StreamingVectorIndex.writeBatch(vecs, centroids, indexDir, b)
        onFamilyTree(b, 0)
        extraFamilies.zipWithIndex.foreach { case ((cents, dir), i) =>
          StreamingVectorIndex.writeBatch(vecs, cents, dir, b)
          onFamilyTree(b, i + 1) }
        StreamingPostingsIndex.writeBatch(
          kept.select(col("doc_id"), col("text")), "doc_id", "text",
          postingsDir, b)
        MaintenanceLock.heartbeat(spark, prefix)
      }
      // prune derived-tree partitions the kept store no longer has: a
      // crash during an earlier maintain's per-dir compaction (the
      // folds are not atomic ACROSS dirs) can leave a derived tree with
      // batch partitions keptDir folded away — their pre-scrub
      // vectors/postings would survive the re-derivation above
      // silently, since step 2 only overwrites partitions present
      // under keptDir
      val keptSet = batches.toSet
      (Seq(cardDir, indexDir, postingsDir) ++ extraFamilies.map(_._2))
        .foreach { d =>
          StreamingBatchDirs.list(spark, d).filterNot(keptSet).foreach {
            stale =>
              val p = new Path(s"$d/batch=$stale")
              p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .delete(p, true)
          }
        }
      onStep(2)
      // 3. re-fingerprint the band index from the scrubbed store
      if (batches.nonEmpty)
        StreamingContentDedup.rebuildIndexFrom(spark,
          readTree(spark, keptDir, batches)
            .select(col("doc_id"), col("text")),
          prefix, buckets)
      onStep(3)
    }
  }

  /** Stage-5 maintenance policy: fold any batch tree that exceeds
    * `maxSegments` committed partitions
    * ([[graft.operators.Compaction.maybeCompactBatchTree]] — the fold
    * keeps the newest partition replayable, so running INSIDE
    * foreachBatch before the checkpoint commit is safe), and when a
    * takedown left tombstones pending, settle it COMPLETELY under one
    * snapshot:
    *
    *  1. purge the snapshot ids from the three row-level trees and fix
    *     the affected card partials — this closes the one-batch-wide
    *     race where a batch committing concurrently with the takedown
    *     kept the deleted id physically (invisible behind the marker,
    *     but a marker retire without this purge would RESURRECT it);
    *  2. physically purge the band index
    *     ([[graft.operators.Dedup.compactBandIndexWith]], the same
    *     snapshot — never a fresh one, or ids outside the purge set
    *     could retire);
    *  3. STAGE the snapshot for a deferred retire
    *     ([[graft.operators.Tombstones.stageRetire]], keyed by this
    *     batch id) — the marker outlives this batch's possible replay
    *     and retires at the next batch's entry.
    *
    * Runs under the [[graft.operators.MaintenanceLock]]: a takedown
    * racing this batch's stage 5 fails fast with a named error instead
    * of interleaving with the purge (retry it after the batch).
    */
  def maintain(spark: SparkSession, prefix: String, keptDir: String,
               cardDir: String, indexDir: String, postingsDir: String,
               maxSegments: Int, buckets: Int, batchId: Long,
               extraIndexDirs: Seq[String] = Nil): Unit = {
    import graft.operators.{Checkpoints, Compaction, Dedup, MaintenanceLock, Tombstones}
    (Seq(keptDir, cardDir, indexDir, postingsDir) ++ extraIndexDirs)
      .foreach(d => Compaction.maybeCompactBatchTree(spark, d, maxSegments))
    if (Tombstones.read(spark, prefix).isDefined)
      MaintenanceLock.withLock(spark, prefix) {
        val snap = Tombstones.snapshot(spark, prefix)
        snap.foreach { s =>
          val del = s.select(col("id").as("doc_id"))
          // heartbeat between the corpus-touching stages: each purge is
          // O(affected) but an affected partition rewrite can be long at
          // scale, and the lock must keep reading as live meanwhile
          (indexDir +: extraIndexDirs).foreach { d =>
            purgeTree(spark, d, "cand_id", del)
            MaintenanceLock.heartbeat(spark, prefix)
          }
          purgeTree(spark, postingsDir, "doc_id", del)
          MaintenanceLock.heartbeat(spark, prefix)
          purgeKeptAndCards(spark, keptDir, cardDir, del)
          MaintenanceLock.heartbeat(spark, prefix)
        }
        Dedup.compactBandIndexWith(spark, prefix, buckets, snap)
        Tombstones.stageRetire(spark, prefix, snap, batchId)
        snap.foreach(Checkpoints.release) // staged durably; pin done
      }
  }

  /** Takedown: propagate the deletion of `ids` (a one-column `doc_id`
    * frame) through ALL five chain artifacts — the GDPR/licensing path
    * a production curation pipeline cannot ship without. Returns the
    * affected batch ids per row-level tree (exactly the partitions that
    * were rewritten — the at-scale contract the spec pins).
    *
    *  - The band index takes a [[graft.operators.Tombstones]] marker
    *    FIRST (durable intent before any mutation): probes exclude the
    *    documents immediately (anti-join),
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
    *    lang) sums), so they cannot be filtered: instead the card
    *    partials OF THE AFFECTED KEPT BATCHES recompute from the
    *    post-purge kept partitions — O(affected) like the row trees,
    *    not one full kept-store scan per takedown
    *    ([[purgeKeptAndCards]]; card partials are batch-local, and the
    *    affected set is already in hand from the kept discovery). The
    *    crash-recovery story the old unconditional rebuild bought is
    *    kept by a DURABLE INTENT marker written before the kept purge:
    *    a crash between the kept rewrite and the card refresh leaves
    *    the marker, and the next takedown (or re-run) completes the
    *    named refreshes even though discovery no longer finds those
    *    batches. The full rebuild survives only as the fallback for
    *    detected torn state (an independent fold diverged the trees, or
    *    an intent batch no longer exists).
    *
    * Idempotent and crash-recoverable by re-running with the same ids:
    * every step is a pure filter or a recomputation from current state
    * behind a heal-first staged swap, and the card intent marker makes
    * the one invisible staleness (a purged kept batch whose card
    * partial was not yet refreshed) visible to the re-run. A batch
    * committing concurrently with the takedown keeps the deleted id
    * physically (this purge saw only committed partitions) but
    * invisibly — its tombstone filters the batch-entry gate and every
    * probe path — until the next deleteDocs re-run or stage-5
    * maintenance; see [[processBatch]].
    *
    * Runs under the [[graft.operators.MaintenanceLock]] (fails fast
    * against a concurrent stage-5 maintenance or second takedown — the
    * single-writer contract; retry after it completes).
    */
  def deleteDocs(spark: SparkSession, ids: DataFrame, prefix: String,
                 keptDir: String, cardDir: String, indexDir: String,
                 postingsDir: String,
                 extraIndexDirs: Seq[String] = Nil): Map[String, Seq[Long]] = {
    import graft.operators.{Checkpoints, MaintenanceLock, Tombstones}
    MaintenanceLock.withLock(spark, prefix) {
      val del = Checkpoints.pin(ids.select(col("doc_id")).distinct())
      Tombstones.write(spark, prefix, del, "doc_id")
      // heartbeat between tree purges (see maintain): the takedown is
      // the longest body that runs under this lock
      def beat[A](a: A): A = { MaintenanceLock.heartbeat(spark, prefix); a }
      val affected = Map(
        indexDir -> beat(purgeTree(spark, indexDir, "cand_id", del)),
        postingsDir -> beat(purgeTree(spark, postingsDir, "doc_id", del)),
        keptDir -> beat(purgeKeptAndCards(spark, keptDir, cardDir, del))) ++
        extraIndexDirs.map(d =>
          d -> beat(purgeTree(spark, d, "cand_id", del))).toMap
      Checkpoints.release(del)
      affected
    }
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

  /** The batch ids whose partitions contain any of `del` — ONE
    * discovery semi-join over the whole tree (the delete set broadcasts
    * while small — [[graft.operators.Tombstones.hintSmall]], the same
    * mass-purge guard as the probe filters; the distinct collapses to
    * the O(affected) batch-id set). Heals any torn swap first.
    */
  private def discoverAffected(spark: SparkSession, dir: String,
                               idCol: String, del: DataFrame): Seq[Long] = {
    import graft.operators.Tombstones
    healSwaps(spark, dir)
    val batches = StreamingBatchDirs.list(spark, dir)
    if (batches.isEmpty) return Seq.empty
    val tree = readTree(spark, dir, batches)
    tree
      .join(Tombstones.hintSmall(del), tree(idCol) === del("doc_id"),
        "left_semi")
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  /** Purge `del` from one row-level tree: discovery, then a staged-swap
    * rewrite of only the affected partitions. Driver job count is
    * O(affected)+1 — a long-running pre-compaction stream has thousands
    * of segments, and a takedown touching one of them must not cost
    * thousands of sequential probe jobs to find out. Returns the
    * affected ids.
    */
  private def purgeTree(spark: SparkSession, dir: String, idCol: String,
                        del: DataFrame): Seq[Long] = {
    val affected = discoverAffected(spark, dir, idCol, del)
    affected.foreach(b => rewritePartition(spark, dir, b, idCol, del))
    affected
  }

  /** Purge the kept tree AND keep the card tree consistent, O(affected)
    * end to end:
    *
    *  1. discover the affected kept batches;
    *  2. union in any batches a CRASHED earlier refresh left named in
    *     the intent marker (their kept partitions are already purged,
    *     so discovery alone would never find them — exactly the
    *     staleness the old design paid a full rebuild to cover);
    *  3. write the union as the new intent marker — durable BEFORE the
    *     kept mutation, so the kept-purged/card-stale window is always
    *     marked;
    *  4. rewrite the affected kept partitions (staged swaps);
    *  5. refresh exactly the intent batches' card partials
    *     ([[refreshCardPartials]] — falls back to the full rebuild on
    *     detected torn state);
    *  6. drop the marker.
    *
    * Returns the kept batches affected by THIS delete set (the
    * takedown's contract), not the healed carry-overs.
    */
  private def purgeKeptAndCards(spark: SparkSession, keptDir: String,
                                cardDir: String, del: DataFrame): Seq[Long] = {
    val carried = readCardIntent(spark, cardDir)
    val affected = discoverAffected(spark, keptDir, "doc_id", del)
    val intent = (affected ++ carried).distinct.sorted
    // a card tree that no longer mirrors the kept tree is repair work
    // even when THIS delete touches nothing — an out-of-band torn state
    // (an independent fold, or a crash predating the intent marker)
    // that the re-run contract promises to reconcile
    val mirrors = StreamingBatchDirs.list(spark, keptDir) ==
      StreamingBatchDirs.list(spark, cardDir)
    if (intent.nonEmpty || !mirrors) {
      if (intent.nonEmpty) writeCardIntent(spark, cardDir, intent)
      affected.foreach(b => rewritePartition(spark, keptDir, b, "doc_id", del))
      refreshCardPartials(spark, keptDir, cardDir, intent)
      deleteCardIntent(spark, cardDir)
    }
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
                               idCol: String, del: DataFrame): Unit =
    swapInPartition(spark, dir, b) { staging =>
      val part = spark.read.parquet(s"$dir/batch=$b")
      part.join(graft.operators.Tombstones.hintSmall(del),
          part(idCol) === del("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(staging)
    }

  /** Replace `dir/batch=<b>` with whatever `write` puts at the staging
    * path, atomically: write staging → rename target aside → rename
    * staging in → drop the aside. At every instant a complete copy of
    * the partition exists under SOME name; [[healSwaps]] resolves a
    * torn state from which names survive.
    */
  private def swapInPartition(spark: SparkSession, dir: String, b: Long)
                             (write: String => Unit): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$dir/batch=$b")
    val staging = new Path(s"$dir/.batch=$b._staging")
    val held = new Path(s"$dir/.batch=$b._old")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(staging.toString)
    if (fs.exists(held)) fs.delete(held, true)
    require(fs.rename(target, held), s"rename $target aside failed")
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    fs.delete(held, true)
  }

  /** Complete or roll back swaps a crashed [[swapInPartition]] left
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

  // ---- card intent marker ---------------------------------------------------
  // A sibling file of the card tree naming the kept batches whose card
  // partials are due a refresh — written BEFORE the kept purge, dropped
  // after the refresh, so the only invisible-staleness window of the
  // O(affected) design is always durably marked. A sibling (not a
  // child) so a full card-tree rebuild or swap cannot take it along.

  private def cardIntentPath(cardDir: String) =
    new Path(cardDir.stripSuffix("/") + "._refresh_pending")

  private def readCardIntent(spark: SparkSession,
                             cardDir: String): Seq[Long] = {
    val p = cardIntentPath(cardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split('\n').toSeq.flatMap(_.trim.toLongOption)
    }
  }

  private def writeCardIntent(spark: SparkSession, cardDir: String,
                              batches: Seq[Long]): Unit = {
    val p = cardIntentPath(cardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(batches.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
  }

  private def deleteCardIntent(spark: SparkSession, cardDir: String): Unit = {
    val p = cardIntentPath(cardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Refresh exactly `batches`' card partials from their (post-purge)
    * kept partitions — one staged swap per affected partial, unaffected
    * partials untouched (byte-for-byte; the spec pins it). Falls back
    * to [[rebuildCardTree]] when the trees are in a state the
    * per-partition path cannot trust: the card tree no longer mirrors
    * the kept tree partition-for-partition (an independent
    * [[graft.operators.Compaction.compactBatchTree]] fold), or an
    * intent batch no longer exists in either tree (folded away after a
    * crash) — rare states, priced at one kept scan, exactly what the
    * old design paid on EVERY takedown.
    */
  private def refreshCardPartials(spark: SparkSession, keptDir: String,
                                  cardDir: String,
                                  batches: Seq[Long]): Unit = {
    healSwaps(spark, cardDir)
    val keptB = StreamingBatchDirs.list(spark, keptDir).toSet
    val cardB = StreamingBatchDirs.list(spark, cardDir).toSet
    if (keptB != cardB || !batches.forall(keptB.contains))
      rebuildCardTree(spark, keptDir, cardDir)
    else batches.foreach { b =>
      swapInPartition(spark, cardDir, b) { staging =>
        StreamingCardStats.partials(
            spark.read.parquet(s"$keptDir/batch=$b"))
          .write.mode("overwrite").parquet(staging)
      }
    }
  }

  /** Rebuild the card tree from the post-delete kept store in ONE job
    * (plus renames): partials grouped by the kept batch id, written
    * `partitionBy("batch")` to a staging tree, swapped in atomically —
    * not one write job per kept batch. A kept partition emptied by the
    * delete produces no card group, so its empty partial is written
    * after the swap (O(emptied) tiny jobs) to keep the card tree
    * mirroring the kept tree partition-for-partition. The RECOVERY
    * path since the O(affected) refresh landed — torn/diverged trees
    * only, no longer every takedown.
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
            gate: Option[graft.operators.Contamination.BenchmarkGate] = None,
            lineCuration: Option[LineCuration] = None,
            semanticDedup: Option[SemanticDedup] = None,
            onStage: (Long, Int) => Unit = (_, _) => ()): StreamingQuery = {
    StreamingContentDedup.bootstrapIndex(source.sparkSession, prefix, buckets)
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, prefix, keptDir, cardDir,
          indexDir, postingsDir, centroids, batchId, jaccardMin, buckets,
          dims, maxSegments, gate, lineCuration, semanticDedup, onStage)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
