package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete/retract propagation for the persisted-index family — the
  * band index ([[Dedup.writeBandIndex]]), the IVF lists
  * ([[Similarity.writeIvfIndex]]), the BM25 postings
  * ([[Retrieval.writeBm25Index]]) and the winnow postings
  * ([[Dedup.writeWinnowIndex]]). Those artifacts are build-once +
  * append-only; a production corpus takes deletions (takedowns,
  * licensing, PII purges) that must NOT wait for a full index rebuild.
  *
  * Mechanism — the LSM tombstone idea applied to catalog tables:
  *
  *  1. [[write]] appends the deleted ids to a small side table
  *     `<prefix>_tombstones` (append-only, so the write is cheap and
  *     idempotent under streaming replay — duplicates are `distinct`ed
  *     at read).
  *  2. Probe paths call [[filter]]: a BROADCAST anti-join of the index
  *     scan against the tombstone set. The broadcast side is the
  *     (small) delete set, so the index side's bucketed partitioning
  *     survives and probes stay corpus-exchange-free — deletes cost
  *     O(tombstones) per probe, never a rebuild.
  *  3. Compaction (`compact*Index` in each index's home object)
  *     physically drops tombstoned rows during its rewrite and then
  *     [[clear]]s the side table — the storage cost is reclaimed and
  *     the probe-time anti-join returns to a no-op.
  *
  * The tombstone set is assumed broadcast-small between compactions
  * (deletes are rare events against a 100 TB corpus); a delete wave
  * large enough to outgrow a broadcast is exactly when you run the
  * compaction instead.
  */
object Tombstones {

  def tableName(prefix: String): String = s"${prefix}_tombstones"

  private def defaultLocation(spark: SparkSession,
                              table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))

  /** Re-register a previous JVM's tombstone files as live deletes.
    * After a restart the in-memory catalog forgets the table while its
    * parquet files survive at the default location; treating the table
    * as absent would silently serve deleted documents, and letting the
    * next [[write]] clear the files would silently DESTROY the previous
    * JVM's deletes. Adoption is the conservative resolution: the
    * orphaned ids become live tombstones again. That is always safe —
    * ids already physically purged anti-join to a no-op — and it makes
    * delete durability survive restarts with no operator intervention.
    * (The one semantic it costs: a doc id REUSED after its takedown
    * stays filtered until the next compaction retires the marker —
    * identical to the in-JVM behavior between a delete and its
    * compaction, so adoption changes nothing the contract didn't
    * already say.) No-op when the table is registered or no files
    * exist. Rewrites the rows as a fresh managed table (pin → delete
    * files → [[write]]) so later appends and `DROP TABLE` keep their
    * managed-table file semantics.
    */
  def adopt(spark: SparkSession, prefix: String): Unit = {
    val table = tableName(prefix)
    if (spark.catalog.tableExists(table)) return
    val loc = defaultLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) return
    val orphans = Checkpoints.pin(
      spark.read.parquet(loc.toString).select(col("id")).distinct())
    fs.delete(loc, true)
    write(spark, prefix, orphans, "id")
  }

  /** Append delete markers for `ids` (a one-column id frame, or any
    * frame carrying `idCol`). Idempotent under replay: re-appending the
    * same ids only costs storage until the next compaction. Orphaned
    * files from a previous JVM are [[adopt]]ed first — the previous
    * deletes keep filtering rather than being silently replaced.
    */
  def write(spark: SparkSession, prefix: String, ids: DataFrame,
            idCol: String): Unit = {
    adopt(spark, prefix)
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").format("parquet")
      .saveAsTable(tableName(prefix))
  }

  /** The distinct tombstoned ids, if any delete was ever recorded —
    * including a previous JVM's ([[adopt]]ed on first touch, so a
    * restart can never silently serve deleted documents).
    */
  def read(spark: SparkSession, prefix: String): Option[DataFrame] = {
    if (!spark.catalog.tableExists(tableName(prefix)))
      adopt(spark, prefix)
    if (spark.catalog.tableExists(tableName(prefix)))
      Some(spark.table(tableName(prefix)).select(col("id")).distinct())
    else None
  }

  /** Anti-join `df` against the tombstone set — a no-op (same plan)
    * when no delete was ever recorded. The tombstone side broadcasts,
    * so `df`'s (bucketed) output partitioning is preserved.
    */
  def filter(spark: SparkSession, prefix: String, df: DataFrame,
             idCol: String): DataFrame =
    read(spark, prefix) match {
      case Some(ts) =>
        df.join(broadcast(ts.select(col("id").as("__ts_id"))),
          col(idCol) === col("__ts_id"), "left_anti")
      case None => df
    }

  /** A PINNED copy of the current tombstone ids, for the compaction
    * protocol: compactions must filter their rewrite with a snapshot
    * and afterwards [[retire]] exactly that snapshot — retiring "the
    * whole table" instead would silently discard any tombstone written
    * DURING the (long, corpus-scale) rewrite, resurrecting the deleted
    * document (the lost-delete race).
    */
  def snapshot(spark: SparkSession, prefix: String): Option[DataFrame] =
    read(spark, prefix).map(Checkpoints.pin)

  /** [[filter]] against an explicit (snapshot) tombstone set. */
  def filterWith(df: DataFrame, snap: Option[DataFrame],
                 idCol: String): DataFrame =
    snap match {
      case Some(ts) =>
        df.join(broadcast(ts.select(col("id").as("__ts_id"))),
          col(idCol) === col("__ts_id"), "left_anti")
      case None => df
    }

  /** Remove exactly the `applied` ids from the tombstone table — the
    * compaction epilogue. Ids written after the snapshot survive and
    * keep filtering probes until the next compaction. Drops the table
    * (and its files) when nothing survives.
    *
    * Concurrency contract: the lost-delete protection covers deletes
    * that land during the (long) index REWRITE — they are outside the
    * snapshot and survive here by the anti-join. It does NOT cover the
    * epilogue itself: a [[write]] landing between this method's pin of
    * the survivor set and its DROP TABLE is discarded with the dropped
    * files, and one racing the recreate can hit the dropped-table
    * window. Deletes must be quiesced across this (row-count-sized,
    * sub-second) epilogue — the single-writer discipline every caller
    * here already has: compactions and takedowns run from one
    * maintenance driver, never concurrently with each other.
    */
  def retire(spark: SparkSession, prefix: String,
             applied: Option[DataFrame]): Unit =
    applied.foreach { a =>
      val table = tableName(prefix)
      if (spark.catalog.tableExists(table)) {
        val rest = Checkpoints.pin(
          spark.table(table).select(col("id")).distinct()
            .join(broadcast(a.select(col("id").as("__a"))),
              col("id") === col("__a"), "left_anti"))
        spark.sql(s"DROP TABLE IF EXISTS $table") // drops the files too
        if (!rest.isEmpty) write(spark, prefix, rest, "id")
      }
    }

  /** Copy the tombstones recorded AFTER `applied` (the snapshot a
    * REBUILD filtered with) from `fromPrefix` to `toPrefix` — the
    * version-swap half of the lost-delete protocol: a rebuild writes a
    * NEW prefix and leaves the old one (and its tombstone table) for
    * current readers, so [[retire]] does not apply; instead the late
    * deletes must follow the swap, or the rebuilt index serves them
    * again. No-op when nothing was recorded after the snapshot.
    *
    * A delete can still land AFTER this call and BEFORE the caller
    * swaps its readers — the residual window of any version swap.
    * Callers either quiesce deletes across the swap, or re-run
    * carryForward once more AFTER the swap: it is safe to repeat
    * (anti-join against the same snapshot; duplicate markers are
    * `distinct`ed at read) and the second run picks up exactly the
    * swap-window stragglers.
    */
  def carryForward(spark: SparkSession, fromPrefix: String,
                   toPrefix: String, applied: Option[DataFrame]): Unit =
    read(spark, fromPrefix).foreach { cur =>
      val late = Checkpoints.pin(filterWith(cur, applied, "id"))
      if (!late.isEmpty) write(spark, toPrefix, late, "id")
    }

  /** Drop the tombstone table unconditionally — including orphaned
    * files a previous JVM left (the explicit "the index was rebuilt
    * from scratch, these markers are obsolete" path, the one case
    * where [[adopt]]'s keep-everything default is not wanted). ONLY
    * safe when no concurrent delete can be in flight (tests, quiesced
    * maintenance); running compactions use [[snapshot]] + [[retire]]
    * instead.
    */
  def clear(spark: SparkSession, prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(prefix)}")
    val loc = defaultLocation(spark, tableName(prefix))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
