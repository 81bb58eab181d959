package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Ownership metadata: the lock file records its holder
  * (host / pid / thread) and a heartbeat timestamp, refreshed by
  * [[heartbeat]] between the stages of long maintenance bodies — so an
  * operator facing a held lock can distinguish "live owner on another
  * driver" (fresh heartbeat: wait) from "crashed owner" (heartbeat
  * older than [[staleAfterMs]]: safe to force). The fail-fast message
  * carries the owner identity and the staleness verdict, and
  * [[forceRelease]] REFUSES a fresh lock — forcing out a live owner
  * would be exactly the interleaving the lock exists to prevent.
  *
  * Fail-fast, not wait: maintenance collisions are operator errors
  * under the contract, and blocking a micro-batch behind a long
  * takedown would hide them. Callers retry after the running
  * maintenance completes. A lock file left by a CRASHED driver must be
  * cleared explicitly with [[forceRelease]] (the `git index.lock`
  * discipline) — now an informed call, not a guess.
  */
object MaintenanceLock {

  final class ConcurrentMaintenanceException(msg: String)
    extends IllegalStateException(msg)

  /** A heartbeat older than this is reported stale and unblocks
    * [[forceRelease]] (session-overridable via
    * `graft.maintenance.lockStaleMs`). 10 minutes: an order of
    * magnitude above the heartbeat cadence of the long maintenance
    * bodies (once per stage), far below any human recovery loop.
    */
  val DefaultStaleAfterMs = 600000L

  private def staleAfterMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.maintenance.lockStaleMs")
      .map(_.toLong).getOrElse(DefaultStaleAfterMs)

  /** lock-file path → owning thread (this JVM only) */
  private val held = new ConcurrentHashMap[String, Thread]()

  private lazy val hostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  private lazy val pid: Long = ProcessHandle.current().pid()

  private[operators] def lockPath(spark: SparkSession, prefix: String): Path = {
    val loc = new Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          Tombstones.tableName(prefix))))
    new Path(loc.getParent, s".${prefix}_maintenance.lock")
  }

  /** The recorded holder of a lock file: identity plus the heartbeat
    * epoch (falls back to the file's modification time for an empty or
    * torn file — a crash can land between create and the metadata
    * write).
    */
  private[operators] final case class Owner(host: String, pid: Long,
                                            thread: String,
                                            heartbeatMs: Long) {
    def describe(nowMs: Long, staleMs: Long): String = {
      val age = math.max(0L, nowMs - heartbeatMs)
      val verdict =
        if (age >= staleMs) s"STALE (heartbeat ${age} ms old — a crashed " +
          "driver; MaintenanceLock.forceRelease will clear it)"
        else s"live (heartbeat ${age} ms old — retry after it completes)"
      s"host=$host pid=$pid thread=$thread, $verdict"
    }
  }

  private def writeOwner(fs: FileSystem, path: Path): Unit = {
    val out = fs.create(path, true)
    try out.write(
      (s"host=$hostName\npid=$pid\nthread=${Thread.currentThread().getName}\n" +
        s"heartbeat_ms=${System.currentTimeMillis()}\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[operators] def readOwner(fs: FileSystem, path: Path): Owner = {
    val kv: Map[String, String] =
      try {
        val in = fs.open(path)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        txt.split('\n').flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
      } catch { case _: Exception => Map.empty }
    val fallbackMs =
      try fs.getFileStatus(path).getModificationTime
      catch { case _: Exception => 0L }
    Owner(
      kv.getOrElse("host", "unknown"),
      kv.get("pid").flatMap(_.toLongOption).getOrElse(-1L),
      kv.getOrElse("thread", "unknown"),
      kv.get("heartbeat_ms").flatMap(_.toLongOption).getOrElse(fallbackMs))
  }

  /** Refresh the heartbeat of a lock THIS thread holds — call between
    * the stages of a long maintenance body, so a concurrent operator
    * (and [[forceRelease]]) keeps seeing the owner as live. No-op
    * cheap: one small file rewrite. Throws if the calling thread does
    * not hold the lock (a heartbeat from a non-owner would launder a
    * stale lock back to live).
    */
  def heartbeat(spark: SparkSession, prefix: String): Unit = {
    val path = lockPath(spark, prefix)
    require(held.get(path.toString) eq Thread.currentThread(),
      s"heartbeat on '$prefix' from a thread that does not hold the lock")
    writeOwner(path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Run `body` holding `prefix`'s maintenance lock. Reentrant within
    * the owning thread; any other concurrent caller — same JVM or
    * another — fails fast with [[ConcurrentMaintenanceException]]
    * naming the recorded owner and whether its heartbeat is stale.
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
    if (!created) {
      val who = readOwner(fs, path)
        .describe(System.currentTimeMillis(), staleAfterMs(spark))
      throw new ConcurrentMaintenanceException(
        s"maintenance lock $path is held by another maintenance driver: " +
          s"$who. The single-writer contract forbids concurrent " +
          "compactions/takedowns.")
    }
    writeOwner(fs, path)
    held.put(key, me)
    try body
    finally {
      held.remove(key)
      fs.delete(path, false)
    }
  }

  /** Remove `prefix`'s lock file — ONLY for recovering from a crashed
    * maintenance driver. Refuses while a holder is live in THIS JVM,
    * and refuses while the recorded heartbeat is FRESH (younger than
    * [[staleAfterMs]]): a live owner on another driver is exactly the
    * case forcing would corrupt. A crashed owner stops heartbeating,
    * so the refusal clears itself after the staleness window.
    */
  def forceRelease(spark: SparkSession, prefix: String): Unit = {
    val path = lockPath(spark, prefix)
    val owner = held.get(path.toString)
    require(owner == null,
      s"maintenance on '$prefix' is live in this JVM " +
        s"(thread '${Option(owner).map(_.getName).getOrElse("?")}') — not a stale lock")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val who = readOwner(fs, path)
    val now = System.currentTimeMillis()
    val staleMs = staleAfterMs(spark)
    if (now - who.heartbeatMs < staleMs)
      throw new IllegalStateException(
        s"refusing to force-release $path: its heartbeat is fresh — " +
          s"${who.describe(now, staleMs)}. If the owner truly crashed, " +
          s"retry after the ${staleMs} ms staleness window (or lower " +
          "graft.maintenance.lockStaleMs for this session).")
    fs.delete(path, false)
  }
}
