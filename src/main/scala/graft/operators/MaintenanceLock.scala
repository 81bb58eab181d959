package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The single-writer maintenance contract, made loud.
  *
  * [[Tombstones.retire]]'s epilogue (pin survivors → drop table →
  * recreate) and [[Tombstones.write]]'s adopt-then-append are only
  * correct when no second mutation interleaves; the documented contract
  * — "compactions and takedowns run from one maintenance driver" — was
  * previously invisible to the compiler and silently racy when
  * violated. This lock makes it fail fast instead: every tombstone
  * MUTATION (write / retire / clear / adopt's file moves) and every
  * coarse maintenance entry point (takedown, stage-5 policy) acquires
  * the per-prefix lock; a second concurrent caller gets a
  * [[MaintenanceLock.ConcurrentMaintenanceException]] naming the
  * holder instead of corrupting the delete state.
  *
  * Mechanics: one lock file per prefix next to the tombstone table's
  * default location (`FileSystem.createNewFile` — atomic on local FS
  * and HDFS), plus an in-JVM owner map for (a) same-thread reentrancy
  * (nested protocols: a takedown's `write` inside the takedown's own
  * lock) and (b) cross-thread fail-fast without touching the
  * filesystem. READ paths (probe filters, snapshots) never lock.
  *
  * Fail-fast, not wait: maintenance collisions are operator errors
  * under the contract, and blocking a micro-batch behind a long
  * takedown would hide them. Callers retry after the running
  * maintenance completes. A lock file left by a CRASHED driver must be
  * cleared explicitly with [[forceRelease]] (the `git index.lock`
  * discipline) — the file records its holder to make that call an
  * informed one.
  */
object MaintenanceLock {

  final class ConcurrentMaintenanceException(msg: String)
    extends IllegalStateException(msg)

  /** lock-file path → owning thread (this JVM only) */
  private val held = new ConcurrentHashMap[String, Thread]()

  private[operators] def lockPath(spark: SparkSession, prefix: String): Path = {
    val loc = new Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          Tombstones.tableName(prefix))))
    new Path(loc.getParent, s".${prefix}_maintenance.lock")
  }

  /** Run `body` holding `prefix`'s maintenance lock. Reentrant within
    * the owning thread; any other concurrent caller — same JVM or
    * another — fails fast with [[ConcurrentMaintenanceException]].
    */
  def withLock[T](spark: SparkSession, prefix: String)(body: => T): T = {
    val path = lockPath(spark, prefix)
    val key = path.toString
    val me = Thread.currentThread()
    val owner = held.get(key)
    if (owner eq me) return body // reentrant: outermost call releases
    if (owner != null)
      throw new ConcurrentMaintenanceException(
        s"maintenance on '$prefix' is already running in thread " +
          s"'${owner.getName}' of this JVM; the single-writer contract " +
          "forbids concurrent compactions/takedowns — retry after it completes")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val created =
      try fs.createNewFile(path)
      catch { case _: java.io.IOException => false }
    if (!created)
      throw new ConcurrentMaintenanceException(
        s"maintenance lock $path is held by another maintenance driver " +
          "(or was left by a crashed one); the single-writer contract forbids " +
          "concurrent compactions/takedowns — retry after it completes, or " +
          "clear a stale lock with MaintenanceLock.forceRelease")
    held.put(key, me)
    try body
    finally {
      held.remove(key)
      fs.delete(path, false)
    }
  }

  /** Remove `prefix`'s lock file unconditionally — ONLY for recovering
    * from a crashed maintenance driver, after confirming none is
    * running. Refuses while a holder is live in THIS JVM.
    */
  def forceRelease(spark: SparkSession, prefix: String): Unit = {
    val path = lockPath(spark, prefix)
    val owner = held.get(path.toString)
    require(owner == null,
      s"maintenance on '$prefix' is live in this JVM " +
        s"(thread '${Option(owner).map(_.getName).getOrElse("?")}') — not a stale lock")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, false)
  }
}
