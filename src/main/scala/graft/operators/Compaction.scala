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
}
