package graft.operators

import org.apache.hadoop.fs.Path

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
  *  2. Probe paths call [[filter]]: an anti-join of the index scan
  *     against the tombstone set, BROADCAST while the set is small
  *     (the common case — the index side's bucketed partitioning
  *     survives and probes stay corpus-exchange-free; deletes cost
  *     O(tombstones) per probe, never a rebuild). Past
  *     [[broadcastMaxIds]] the hint is DROPPED and the planner picks
  *     the strategy: a mass-purge wave (the GDPR batch case) degrades
  *     to a shuffled anti-join instead of OOMing the executors — the
  *     size check is a capped `limit(max+1).count()` against the
  *     (tiny) tombstone side, one bounded job per filtered read, paid
  *     only while deletes are actually pending.
  *  3. Compaction (`compact*Index` in each index's home object)
  *     physically drops tombstoned rows during its rewrite and then
  *     [[retire]]s the applied snapshot — the storage cost is
  *     reclaimed and the probe-time anti-join returns to a no-op.
  *
  * Every MUTATION here (write, retire, clear, adopt's file moves,
  * pending-retire) runs under the per-prefix [[MaintenanceLock]]: the
  * epilogue interleavings that could silently lose a delete now fail
  * fast with a named error instead (the single-writer contract, made
  * loud). Read paths never lock.
  */
object Tombstones {

  def tableName(prefix: String): String = s"${prefix}_tombstones"

  /** Tombstone sets at or below this many ids broadcast in [[filter]] /
    * [[filterWith]] / [[hintSmall]]; larger sets leave the join
    * strategy to the planner (session-overridable via
    * `graft.tombstones.broadcastMaxIds`). 1M ids ≈ 8 MB of longs —
    * comfortably inside executor broadcast budgets; a delete wave past
    * it is exactly when the compaction should run, and until it does,
    * probes degrade to a shuffled anti-join instead of an executor OOM.
    */
  val DefaultBroadcastMaxIds = 1000000L

  private def broadcastMaxIds(spark: SparkSession): Long =
    spark.conf.getOption("graft.tombstones.broadcastMaxIds")
      .map(_.toLong).getOrElse(DefaultBroadcastMaxIds)

  /** Cached guard verdicts live this long before a probe re-counts —
    * the cross-driver drift bound: mutations in THIS JVM refresh the
    * cache under the lock, but a mass purge written by ANOTHER driver
    * is only noticed when the TTL lapses (session-overridable via
    * `graft.tombstones.smallCacheTtlMs`). One counting job per prefix
    * per TTL window, instead of one per probe read.
    */
  val DefaultSmallCacheTtlMs = 300000L

  private def smallCacheTtlMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.tombstones.smallCacheTtlMs")
      .map(_.toLong).getOrElse(DefaultSmallCacheTtlMs)

  /** `tableName#max` → (verdict, computed-at epoch ms). Keyed by the
    * session-resolved cap so a conf change cannot read a verdict
    * computed against a different threshold.
    */
  private val smallCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Long)]()

  private def smallKey(spark: SparkSession, prefix: String): String =
    s"${tableName(prefix)}#${broadcastMaxIds(spark)}"

  private def computeSmall(ids: DataFrame): Boolean = {
    val max = broadcastMaxIds(ids.sparkSession)
    val capped = math.min(max, Int.MaxValue - 1L).toInt
    ids.limit(capped + 1).count() <= capped
  }

  /** Refresh `prefix`'s cached guard verdict from the current table
    * state — every mutation calls this while it still holds the
    * [[MaintenanceLock]], so the guard is FREE on the probe path: the
    * counting job runs once per mutation (which already pays
    * table-sized jobs), not once per tombstone-filtered read.
    */
  private def refreshSmall(spark: SparkSession, prefix: String): Unit = {
    val keyPrefix = s"${tableName(prefix)}#"
    smallCache.keySet.removeIf(_.startsWith(keyPrefix))
    if (spark.catalog.tableExists(tableName(prefix)))
      smallCache.put(smallKey(spark, prefix),
        (computeSmall(spark.table(tableName(prefix)).select(col("id"))
          .distinct()), System.currentTimeMillis()))
  }

  /** The cached form of [[hintSmall]] for `prefix`'s own tombstone
    * set: mutations pre-compute the verdict under the lock, a cache
    * miss (fresh JVM, or TTL lapse against another driver's writes)
    * computes it once — the probe path itself never pays the counting
    * job.
    */
  private def hintSmallCached(spark: SparkSession, prefix: String,
                              ids: DataFrame): DataFrame = {
    val key = smallKey(spark, prefix)
    val now = System.currentTimeMillis()
    val cached = smallCache.get(key)
    val small =
      if (cached != null && now - cached._2 < smallCacheTtlMs(spark))
        cached._1
      else {
        val s = computeSmall(ids)
        smallCache.put(key, (s, now))
        s
      }
    if (small) broadcast(ids) else ids
  }

  /** `broadcast(ids)` while the set is small ([[broadcastMaxIds]]);
    * above it, the frame unhinted — the planner/AQE picks. The count is
    * capped at max+1 rows, so the check never scans a mass-purge set.
    * Pays one counting job per call — for an arbitrary id frame that is
    * the only safe form; the prefix-keyed probe paths ([[filter]],
    * [[snapshot]]) ride the mutation-refreshed cache instead.
    */
  def hintSmall(ids: DataFrame): DataFrame = {
    val max = broadcastMaxIds(ids.sparkSession)
    val capped = math.min(max, Int.MaxValue - 1L).toInt
    if (ids.limit(capped + 1).count() <= capped) broadcast(ids) else ids
  }

  private def defaultLocation(spark: SparkSession,
                              table: String): Path =
    new Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))

  /** The durable aside directory of the adopt/retire swap protocols: a
    * COMMITTED copy of marker rows whose table form is mid-rewrite.
    * Invariant: whenever this directory exists, it is complete (writes
    * land under a tmp name and atomically rename in) and it is the
    * authoritative copy — a table-location sibling is either partial or
    * scheduled for deletion, so heal paths may drop the location and
    * re-register from here.
    */
  private def asideLocation(spark: SparkSession, table: String): Path = {
    val loc = defaultLocation(spark, table)
    // NOT dot-prefixed: Spark's file index skips hidden paths, and this
    // directory must stay readable as plain parquet by the heal paths
    new Path(loc.getParent, s"${loc.getName}__swap")
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Commit `rows` (an `id` column) to the aside directory: write under
    * a tmp name, then one atomic rename — the aside either exists whole
    * or not at all, which is what lets heal paths trust it.
    */
  private def commitAside(spark: SparkSession, table: String,
                          rows: DataFrame): Path = {
    val aside = asideLocation(spark, table)
    val fs = fsOf(spark, aside)
    val tmp = new Path(aside.getParent, aside.getName + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    rows.select(col("id")).write.mode("overwrite").parquet(tmp.toString)
    require(!fs.exists(aside), s"aside $aside already exists — heal first")
    require(fs.rename(tmp, aside), s"rename $tmp -> $aside failed")
    aside
  }

  /** Register the aside directory's rows as the managed table and drop
    * the aside — the commit half of both swap protocols. The read
    * streams FROM THE ASIDE FILES (no volatile pin): a crash at any
    * point leaves either the aside (still authoritative, healed by the
    * next [[adopt]]) or the committed table.
    */
  private def registerFromAside(spark: SparkSession, table: String): Unit = {
    val aside = asideLocation(spark, table)
    val fs = fsOf(spark, aside)
    spark.read.parquet(aside.toString).select(col("id")).distinct()
      .write.mode("append").format("parquet").saveAsTable(table)
    fs.delete(aside, true)
  }

  /** Re-register a previous JVM's tombstone files as live deletes, and
    * heal any torn adopt/retire swap. After a restart the in-memory
    * catalog forgets the table while its parquet files survive at the
    * default location; treating the table as absent would silently
    * serve deleted documents, and letting the next [[write]] clear the
    * files would silently DESTROY the previous JVM's deletes. Adoption
    * is the conservative resolution: the orphaned ids become live
    * tombstones again. That is always safe — ids already physically
    * purged anti-join to a no-op — and it makes delete durability
    * survive restarts with no operator intervention. (The one semantic
    * it costs: a doc id REUSED after its takedown stays filtered until
    * the next compaction retires the marker — identical to the in-JVM
    * behavior between a delete and its compaction.)
    *
    * Crash safety (the aside-swap protocol): the orphaned files are
    * first RENAMED aside (atomic — the durable copy is never deleted
    * before the table write commits), the table is written by reading
    * the aside directly, and the aside is dropped only after the
    * commit. A crash anywhere leaves one of three healable states, all
    * resolved here: aside alone (re-register from it), aside + torn
    * location (drop the partial location, re-register), aside + a
    * registered table (the commit landed; fold the aside in — append +
    * distinct-at-read makes that always safe). No-op when the table is
    * registered and no aside exists, or when neither files nor aside
    * exist.
    */
  def adopt(spark: SparkSession, prefix: String): Unit = {
    val table = tableName(prefix)
    val loc = defaultLocation(spark, table)
    val fs = fsOf(spark, loc)
    val aside = asideLocation(spark, table)
    if (!fs.exists(aside)) {
      if (spark.catalog.tableExists(table) || !fs.exists(loc)) return
    }
    MaintenanceLock.withLock(spark, prefix) {
      val registered = spark.catalog.tableExists(table)
      if (!registered && fs.exists(loc)) {
        if (fs.exists(aside)) fs.delete(loc, true) // torn write; aside is whole
        else require(fs.rename(loc, aside), s"rename $loc aside failed")
      }
      if (fs.exists(aside)) {
        registerFromAside(spark, table)
        refreshSmall(spark, prefix)
      }
    }
  }

  /** Append delete markers for `ids` (a one-column id frame, or any
    * frame carrying `idCol`). Idempotent under replay: re-appending the
    * same ids only costs storage until the next compaction. Orphaned
    * files from a previous JVM are [[adopt]]ed first — the previous
    * deletes keep filtering rather than being silently replaced.
    */
  def write(spark: SparkSession, prefix: String, ids: DataFrame,
            idCol: String): Unit = MaintenanceLock.withLock(spark, prefix) {
    adopt(spark, prefix)
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").format("parquet")
      .saveAsTable(tableName(prefix))
    refreshSmall(spark, prefix)
  }

  /** The distinct tombstoned ids, if any delete was ever recorded —
    * including a previous JVM's ([[adopt]]ed on first touch, so a
    * restart can never silently serve deleted documents).
    */
  def read(spark: SparkSession, prefix: String): Option[DataFrame] = {
    // unconditional: besides re-registering a previous JVM's orphans,
    // adopt also folds in a stray aside a crashed swap left NEXT TO a
    // registered table — its fast path is one fs.exists when there is
    // nothing to do
    adopt(spark, prefix)
    if (spark.catalog.tableExists(tableName(prefix)))
      Some(spark.table(tableName(prefix)).select(col("id")).distinct())
    else None
  }

  /** Anti-join `df` against the tombstone set — a no-op (same plan)
    * when no delete was ever recorded. The tombstone side broadcasts
    * while small ([[hintSmall]]), so `df`'s (bucketed) output
    * partitioning is preserved; a mass-purge set drops the hint and
    * degrades to a planner-chosen join instead of an executor OOM.
    */
  def filter(spark: SparkSession, prefix: String, df: DataFrame,
             idCol: String): DataFrame =
    read(spark, prefix) match {
      case Some(ts) =>
        df.join(hintSmallCached(spark, prefix,
            ts.select(col("id").as("__ts_id"))),
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
    read(spark, prefix).map(ts =>
      hintSmallCached(spark, prefix, Checkpoints.pin(ts)))

  /** [[filter]] against an explicit (snapshot) tombstone set. The
    * broadcast-vs-planner decision was already taken when the snapshot
    * was cut ([[snapshot]] applies the cached [[hintSmall]] verdict),
    * so this is a pure plan composition — no counting job per probe.
    */
  def filterWith(df: DataFrame, snap: Option[DataFrame],
                 idCol: String): DataFrame =
    snap match {
      case Some(ts) =>
        df.join(ts.select(col("id").as("__ts_id")),
          col(idCol) === col("__ts_id"), "left_anti")
      case None => df
    }

  /** Remove exactly the `applied` ids from the tombstone table — the
    * compaction epilogue. Ids written after the snapshot survive and
    * keep filtering probes until the next compaction. Drops the table
    * (and its files) when nothing survives.
    *
    * Durability (the aside-swap protocol, mirroring [[adopt]]): the
    * survivor set is committed to the aside directory BEFORE the table
    * drops — a crash between the drop and the re-register leaves the
    * aside as the authoritative copy, healed by the next [[adopt]];
    * the previous pin-drop-rewrite shape could permanently lose the
    * post-snapshot deletes when the pin was a (non-fault-tolerant)
    * localCheckpoint.
    *
    * Concurrency: runs under the [[MaintenanceLock]], as does
    * [[write]] — the epilogue interleaving that silently discarded a
    * concurrent write now fails fast on the writer instead (the
    * single-writer contract; callers retry after the epilogue, which
    * is row-count-sized and sub-second).
    */
  def retire(spark: SparkSession, prefix: String,
             applied: Option[DataFrame]): Unit =
    applied.foreach { a =>
      MaintenanceLock.withLock(spark, prefix) {
        adopt(spark, prefix) // heal any stray aside before staging a new one
        val table = tableName(prefix)
        if (spark.catalog.tableExists(table)) {
          val loc = defaultLocation(spark, table)
          val fs = fsOf(spark, loc)
          val rest = spark.table(table).select(col("id")).distinct()
            .join(hintSmall(a.select(col("id").as("__a"))),
              col("id") === col("__a"), "left_anti")
          if (rest.isEmpty) {
            spark.sql(s"DROP TABLE IF EXISTS $table") // drops the files too
            if (fs.exists(loc)) fs.delete(loc, true)
          } else {
            commitAside(spark, table, rest) // durable BEFORE the drop
            spark.sql(s"DROP TABLE IF EXISTS $table")
            if (fs.exists(loc)) fs.delete(loc, true)
            registerFromAside(spark, table)
          }
          refreshSmall(spark, prefix)
        }
      }
    }

  // ---- deferred retire (the streaming stage-5 protocol) ---------------------

  private def pendingRoot(spark: SparkSession, prefix: String): Path = {
    val loc = defaultLocation(spark, tableName(prefix))
    new Path(loc.getParent, s"${loc.getName}__retire_pending")
  }

  /** Stage `applied` for a DEFERRED [[retire]], keyed by the
    * micro-batch whose stage-5 compaction applied it physically. A
    * retire running INSIDE foreachBatch before the checkpoint commit is
    * not replay-idempotent — a crash after it replays the batch with an
    * empty entry gate, re-admitting a redelivered deleted doc into
    * every artifact. Staging instead keeps the markers live (the table
    * is untouched; gates and probes still filter) and records the
    * applied set durably; [[retirePending]] retires it only from a
    * STRICTLY LATER batch — whose very existence proves this batch's
    * checkpoint committed and it can never replay. Idempotent per
    * batch: a replayed stage 5 overwrites its own `batch=<id>` staging.
    */
  def stageRetire(spark: SparkSession, prefix: String,
                  applied: Option[DataFrame], batchId: Long): Unit =
    applied.foreach { a =>
      val dir = new Path(pendingRoot(spark, prefix), s"batch=$batchId")
      a.select(col("id")).write.mode("overwrite").parquet(dir.toString)
    }

  /** True when [[retirePending]] would have work — a cheap existence
    * probe for per-batch call sites (no lock, no Spark job).
    */
  def hasPending(spark: SparkSession, prefix: String,
                 beforeBatch: Long): Boolean = {
    val root = pendingRoot(spark, prefix)
    val fs = fsOf(spark, root)
    fs.exists(root) && fs.listStatus(root).exists { s =>
      val n = s.getPath.getName
      n.startsWith("batch=") &&
        n.stripPrefix("batch=").toLongOption.exists(_ < beforeBatch)
    }
  }

  /** [[retire]] every pending set staged by a batch STRICTLY earlier
    * than `beforeBatch`, then drop the staging. Called at the START of
    * batch `beforeBatch` — before its entry snapshot, so a replay of
    * the batch sees the identical marker state as its first attempt
    * (retiring mid-batch would admit different rows on replay).
    * Idempotent: a crash between the retire and the staging delete
    * re-retires an already-absent id set (anti-join no-op).
    */
  def retirePending(spark: SparkSession, prefix: String,
                    beforeBatch: Long): Unit = {
    if (!hasPending(spark, prefix, beforeBatch)) return
    MaintenanceLock.withLock(spark, prefix) {
      val root = pendingRoot(spark, prefix)
      val fs = fsOf(spark, root)
      val due = fs.listStatus(root).filter { s =>
        val n = s.getPath.getName
        n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLongOption.exists(_ < beforeBatch)
      }
      if (due.nonEmpty) {
        val ids = spark.read.parquet(due.map(_.getPath.toString): _*)
          .select(col("id")).distinct()
        retire(spark, prefix, Some(ids))
        due.foreach(s => fs.delete(s.getPath, true))
      }
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
      Checkpoints.release(late)
    }

  /** Drop the tombstone table unconditionally — including orphaned
    * files, a torn aside, and pending-retire staging a previous JVM
    * left (the explicit "the index was rebuilt from scratch, these
    * markers are obsolete" path, the one case where [[adopt]]'s
    * keep-everything default is not wanted). ONLY safe when no
    * concurrent delete can be in flight (tests, quiesced maintenance);
    * running compactions use [[snapshot]] + [[retire]] instead.
    */
  def clear(spark: SparkSession, prefix: String): Unit =
    MaintenanceLock.withLock(spark, prefix) {
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(prefix)}")
      val loc = defaultLocation(spark, tableName(prefix))
      val fs = fsOf(spark, loc)
      Seq(loc, asideLocation(spark, tableName(prefix)),
          pendingRoot(spark, prefix))
        .foreach(p => if (fs.exists(p)) fs.delete(p, true))
      refreshSmall(spark, prefix)
    }
}
