package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance half of every append-heavy
  * pipeline here (streaming kept-docs partitions, at-least-once index
  * appends): micro-batches write many small parquet files, and at
  * 100 TB an uncompacted directory turns every later scan into a
  * file-listing + task-scheduling storm (one task per tiny file).
  *
  * [[compactDir]] rewrites a parquet directory into ~`targetBytes`
  * files: target file count is derived from the CURRENT on-disk bytes
  * (one FileSystem listing — no data pass), the rewrite is one
  * coalesce-shaped job, and the swap is staging-dir + rename — the
  * same atomic-swap discipline as the store sink (readers see the old
  * files or the new files, never a mix). Coalesce, not repartition:
  * compaction must not pay a shuffle just to merge files.
  */
object Compaction {

  /** Rewrite `dir` into files of ~`targetBytes`. Returns (files
    * before, files after). No-op (0 rewrites) if the directory already
    * has ≤ the target count.
    */
  def compactDir(spark: SparkSession, dir: String,
                 targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(path, true)
    var nFiles = 0
    var bytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        nFiles += 1; bytes += f.getLen
      }
    }
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (nFiles <= want) return (nFiles, nFiles)

    val staging = new Path(dir + "._compact_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    spark.read.parquet(dir).coalesce(want)
      .write.mode("overwrite").parquet(staging.toString)
    // atomic swap: old dir out, staging in (rename is atomic per dir
    // on HDFS/local; object stores substitute a committer)
    val old = new Path(dir + "._compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(path, old), s"rename $path -> $old failed")
    require(fs.rename(staging, path), s"rename $staging -> $path failed")
    fs.delete(old, true)
    (nFiles, want)
  }

  /** Compaction for the streaming `batch=<id>` trees
    * ([[graft.streaming.StreamingHeavyHitters]] /
    * `StreamingCardStats` / `StreamingVectorIndex`): fold all COMMITTED
    * batch partitions except the newest into one consolidated
    * partition, so the directory count stops growing with stream age.
    * [[compactDir]] must NOT be pointed at these trees — a flat
    * rewrite turns the `batch` partition column into a data column,
    * and the next `batch=<id>` append then mixes partitioned and
    * unpartitioned files, which Spark's partition discovery rejects.
    *
    * Replay safety is preserved by construction: foreachBatch only
    * ever replays the batch AFTER the last checkpoint commit, so
    * folding every partition EXCEPT the newest (always kept) can never
    * collide with a replayed overwrite; the consolidated rows land
    * under the largest folded id, and a rerun is a no-op until new
    * batches accumulate. Returns (batch dirs before, after).
    *
    * Crash safety: the originals move whole to a `._compact_old`
    * holding dir before the consolidated rename and are deleted only
    * after it, so a crashed fold never loses rows. The next call
    * recovers first: if the consolidated partition made it into the
    * tree the fold committed (the held originals are duplicates —
    * dropped), otherwise it didn't (the held originals are the only
    * copy — restored whole); either way the stale staging is
    * discarded and the worst a crash costs is redoing the fold.
    * Readers see the same brief swap window [[compactDir]] has.
    *
    * Filesystem contract (same as [[compactDir]]): the hold/commit
    * protocol relies on ATOMIC directory rename — local FS and HDFS
    * qualify; on object stores, where rename is copy+delete, a reader
    * or a crash can observe partially-copied state, so these trees
    * belong on a rename-atomic filesystem (or behind a committer).
    * Directories under `dir` whose name is `batch=<non-numeric>` are
    * not ours and are skipped, both in normal listing and in crash
    * recovery.
    */
  /** `batch=<id>` name → id; None for foreign (non-numeric) names. */
  private def batchId(name: String): Option[Long] =
    if (!name.startsWith("batch=")) None
    else name.stripPrefix("batch=").toLongOption

  /** Segment-count policy wrapper over [[compactBatchTree]]: fold only
    * when the tree holds MORE than `maxSegments` committed `batch=<id>`
    * partitions; the check is one directory listing, so calling it
    * every micro-batch is free. This is how the streaming maintainers
    * keep a long-running stream's directory count bounded by policy
    * ([[graft.streaming.StreamingCurationChain]] stage 5) instead of by
    * an operator remembering to run maintenance. `maxSegments` ≥ 2
    * because the fold always keeps the newest partition replayable.
    * Returns (before, after) like [[compactBatchTree]].
    */
  def maybeCompactBatchTree(spark: SparkSession, dir: String,
                            maxSegments: Int): (Int, Int) = {
    require(maxSegments >= 2,
      "maxSegments must be >= 2 (the fold keeps the newest partition)")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return (0, 0)
    val n = fs.listStatus(path).count(s =>
      s.isDirectory && batchId(s.getPath.getName).isDefined)
    if (n <= maxSegments) (n, n) else compactBatchTree(spark, dir)
  }

  def compactBatchTree(spark: SparkSession, dir: String): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return (0, 0)
    val staging = new Path(dir + "._compact_staging")
    val old = new Path(dir + "._compact_old")
    // recovery: a crashed fold leaves the originals in `old` (they are
    // all moved there BEFORE the consolidated rename, and `old` is
    // deleted only after it) plus possibly a stale staging. Whether the
    // fold committed is decided by ONE condition: the target partition
    // (= the largest id held in `old`) is back in the tree only if the
    // staging rename succeeded. Committed → the originals are already
    // represented in the consolidated partition, so restoring ANY of
    // them would double-count: drop `old` whole. Not committed → the
    // tree is missing everything in `old`: restore it whole.
    if (fs.exists(old)) {
      val held = fs.listStatus(old)
        .filter(s => batchId(s.getPath.getName).isDefined)
      if (held.nonEmpty) {
        val targetName = held
          .map(_.getPath.getName)
          .maxBy(n => batchId(n).get)
        if (!fs.exists(new Path(path, targetName)))
          held.foreach { s =>
            require(fs.rename(s.getPath, new Path(path, s.getPath.getName)),
              s"restore ${s.getPath} failed")
          }
      }
      fs.delete(old, true)
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    val batches = fs.listStatus(path)
      .filter(_.isDirectory)
      .flatMap(s => batchId(s.getPath.getName))
      .sorted
    if (batches.length <= 2) return (batches.length, batches.length)
    val fold = batches.dropRight(1) // newest stays replayable
    val target = fold.max
    // read the folded partitions directly (rows carry no batch column,
    // matching what writeBatch puts inside a partition dir); the
    // staging copy is COMPLETE before any original moves
    spark.read
      .parquet(fold.map(b => s"$dir/batch=$b"): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(old)
    fold.foreach { b =>
      val p = new Path(s"$dir/batch=$b")
      require(fs.rename(p, new Path(old, s"batch=$b")), s"rename $p failed")
    }
    require(fs.rename(staging, new Path(s"$dir/batch=$target")),
      s"rename $staging -> batch=$target failed")
    fs.delete(old, true)
    (batches.length, 2)
  }
}
