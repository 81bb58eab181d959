package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The SEMANTIC twin of [[StreamingContentDedup]]: gate each micro-batch
  * against the embeddings the stream has already admitted — the
  * [[StreamingVectorIndex]] lists ARE the dedup structure, so the chain
  * dedups at the lexical AND the semantic level incrementally, with no
  * second index to maintain.
  *
  * Verdict semantics (mirrors the band gate):
  *  - INTRA-batch: any verified pair (cos ≥ `tau`) drops its LARGER id
  *    — matched through the same cell/nprobe probe geometry as the
  *    index probe, against ALL batch docs (not just survivors — the
  *    [[Similarity.semDedup]] transitive-chain caveat applies);
  *  - CROSS-corpus: a batch doc whose nearest indexed neighbor
  *    ([[Similarity.knnIvfIndexed]], k = 1) clears `tau` is dropped.
  *
  * Replay safety, the property the geometry sharing buys: only KEPT
  * documents are ever appended (chain stage 3), and `knnIvfIndexed`
  * excludes same-id matches, so a replayed batch probing the crashed
  * attempt's own partition sees (a) itself — excluded by id; (b) an
  * admitted batch-mate C — but any (probe, C) pair reachable through
  * the index probe's cells is reachable through the SAME cells in the
  * intra-batch pass, which already dropped the larger id on the first
  * attempt; (c) docs from older batches — present on both attempts.
  * Every verdict therefore replays identically (the spec crashes a
  * batch after the index append and pins this).
  *
  * Recall is cell-local like batch SemDeDup: a near-dup pair split
  * across coarse cells is missed at nprobe = 1 — `nprobe` fans the
  * probe (both passes) into the next-nearest cells, the
  * [[Similarity.knnIvf]] dial. Cost per batch: |batch| · k centroid
  * dots + the probed cells' occupancy — the per-batch cost contract,
  * nothing corpus-wide.
  *
  * `tombstones`: an optional [[graft.operators.Tombstones.snapshot]]
  * frame; indexed entries under a delete marker are invisible to the
  * probe, so a takedown un-blocks future semantically-equivalent
  * documents immediately (the band-index takedown semantics).
  */
object StreamingSemanticDedup {

  /** The admitted subset of `batch` (all its columns, order preserved
    * modulo the anti-joins). `batch` must carry `idCol` and `vecCol`.
    */
  def gateBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                vecCol: String, centroids: DataFrame, indexPath: String,
                tau: Double, nprobe: Int = 1,
                tombstones: Option[DataFrame] = None): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, "tau must be in [-1, 1]")
    require(nprobe >= 1, "nprobe must be >= 1")
    val probes = batch.select(col(idCol).as("probe_id"),
      col(vecCol).as("pv"))
    // the on-disk lists, empty-schema-safe before the first commit,
    // with tombstoned entries removed from sight
    val onDisk = StreamingVectorIndex.lists(spark, indexPath,
      probes.select(col("probe_id").as("cand_id"), col("pv").as("cv")),
      centroids)
    val idx = tombstones.fold(onDisk)(t =>
      graft.operators.Tombstones.filterWith(onDisk, Some(t), "cand_id"))
    val crossDrop = Similarity.knnIvfIndexed(probes, centroids, idx,
        k = 1, nprobe)
      .filter(col("cos") >= tau)
      .select(col("probe_id").as(idCol)).distinct()
    // intra-batch: the batch AS the lists, same probe geometry; drop
    // the larger id of every verified pair in either probe orientation.
    // Deliberately NOT knnIvfIndexed: the full pair set is needed (no
    // top-k), so a ranking window would sort every within-cell
    // candidate list for ranks nobody reads — O(|cell|²·log) per
    // skewed batch cell. The direct cell-equi-join (the semDedup
    // shape) computes the same cosines with no window at all.
    val selfLists = Similarity.ivfAssign(
        probes.select(col("probe_id").as("cand_id"), col("pv").as("cv")),
        "cv", "cand_id", centroids)
      .withColumn("_cn", graft.functions.GraftFunctions.l2norm(col("cv")))
    val pc = Similarity.ivfAssign(probes, "pv", "probe_id", centroids,
        nprobe)
      .withColumn("_pn", graft.functions.GraftFunctions.l2norm(col("pv")))
    val intraDrop = pc.join(selfLists, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .filter(round(graft.functions.GraftFunctions.dot(col("pv"), col("cv"))
        / (col("_pn") * col("_cn")), 6) >= tau)
      .select(greatest(col("probe_id"), col("cand_id")).as(idCol))
      .distinct()
    batch
      .join(intraDrop, Seq(idCol), "left_anti")
      .join(crossDrop, Seq(idCol), "left_anti")
  }
}
