package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions.words
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Tombstones]]: delete/retract propagation through the persisted
  * index family. Contract per index — (1) after [[Tombstones.write]]
  * the deleted document stops matching probes WITHOUT a rebuild,
  * (2) other documents keep matching, (3) the compaction physically
  * removes the rows, drops the tombstone table, and probes still
  * exclude the document afterwards.
  */
class TombstonesSpec extends SparkSpec {

  import spark.implicits._

  // docs 1 and 2 are EXACT dups (identical shingle sets -> every LSH
  // band matches deterministically; a near-dup pair would make the
  // band-probe assertion probabilistic in the banding dice)
  private def docs: DataFrame = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "completely unrelated content fills this document body"))
    .toDF("doc_id", "text")

  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      Dedup.shingleHashes3(Dedup.wordHashes(words(col("text")))).as("sh"))

  private def banded(d: DataFrame): DataFrame =
    Dedup.lshBands(
      shingled(d).select(col("doc_id"),
        Dedup.minhashSig(col("sh"), 8).as("sig")),
      "doc_id", "sig", bands = 4, rowsPerBand = 2)

  test("band index: delete -> probe miss, compact -> physically gone") {
    val prefix = "graft_spec_ts_band"
    Dedup.writeBandIndex(banded(docs), shingled(docs), "doc_id", prefix,
      buckets = 4)
    // doc 2 is a near-dup of doc 1; probing with doc 2's bands must hit
    // doc 1 (and itself) before the delete
    val probe = banded(docs.filter($"doc_id" === 2L))
    def hits(): Set[Long] = {
      val (bandsT, _) = Dedup.readBandIndex(spark, prefix)
      Dedup.lshCrossPairs(probe, bandsT, "doc_id")
        .select("id_old").as[Long].collect().toSet
    }
    assert(hits().contains(1L), "pre-delete probe must hit doc 1")

    Tombstones.write(spark, prefix, Seq(1L).toDF("doc_id"), "doc_id")
    assert(!hits().contains(1L), "tombstoned doc must stop matching")
    assert(hits().contains(2L), "other docs must keep matching")
    // the shingle side filters too (the Jaccard-verify join)
    val (_, shT) = Dedup.readBandIndex(spark, prefix)
    assert(!shT.select("doc_id").as[Long].collect().contains(1L))

    Dedup.compactBandIndex(spark, prefix, buckets = 4)
    assert(!spark.catalog.tableExists(Tombstones.tableName(prefix)),
      "compaction must drop the tombstone table")
    assert(!spark.table(s"${prefix}_bands")
      .select("doc_id").as[Long].collect().contains(1L),
      "compaction must physically remove tombstoned band rows")
    assert(!hits().contains(1L) && hits().contains(2L),
      "post-compaction probes unchanged")
  }

  test("retire removes only the snapshot ids: a delete arriving during " +
    "a compaction survives the epilogue") {
    val prefix = "graft_spec_ts_retire"
    Tombstones.write(spark, prefix, Seq(1L).toDF("id"), "id")
    val snap = Tombstones.snapshot(spark, prefix) // compaction starts
    Tombstones.write(spark, prefix, Seq(2L).toDF("id"), "id") // mid-rewrite
    Tombstones.retire(spark, prefix, snap) // compaction epilogue
    val left = Tombstones.read(spark, prefix)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)
    assert(left == Set(2L),
      s"the mid-compaction delete must survive, got $left")
    // retiring the remainder drops the table entirely
    Tombstones.retire(spark, prefix, Tombstones.snapshot(spark, prefix))
    assert(Tombstones.read(spark, prefix).isEmpty)
  }

  test("carryForward ships only post-snapshot deletes to a rebuilt " +
    "prefix; the old prefix keeps its full set for its readers") {
    val from = "graft_spec_ts_cf_from"; val to = "graft_spec_ts_cf_to"
    Tombstones.clear(spark, from); Tombstones.clear(spark, to)
    Tombstones.write(spark, from, Seq(1L).toDF("id"), "id")
    val snap = Tombstones.snapshot(spark, from) // rebuild starts
    Tombstones.write(spark, from, Seq(2L).toDF("id"), "id") // mid-rebuild
    Tombstones.carryForward(spark, from, to, snap) // rebuild epilogue
    def ids(p: String): Set[Long] = Tombstones.read(spark, p)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)
    assert(ids(to) == Set(2L),
      s"only the late delete follows the swap, got ${ids(to)}")
    assert(ids(from) == Set(1L, 2L),
      "the old prefix keeps filtering for its remaining readers")
  }

  test("orphaned tombstone files from a previous JVM are adopted as " +
    "live deletes, not silently lost") {
    val prefix = "graft_spec_ts_orphan"
    val table = Tombstones.tableName(prefix)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the restart: marker files on disk, no catalog entry
    // (exactly what a JVM exit leaves behind a managed table)
    Seq(7L).toDF("id").write.parquet(loc.toString)
    assert(!spark.catalog.tableExists(table))

    def ids(): Set[Long] = Tombstones.read(spark, prefix)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)
    assert(ids() == Set(7L), "read must adopt the previous JVM's deletes")
    assert(spark.catalog.tableExists(table),
      "adoption re-registers the managed table")
    // appends merge with the adopted set instead of replacing it
    Tombstones.write(spark, prefix, Seq(9L).toDF("id"), "id")
    assert(ids() == Set(7L, 9L))
    // the explicit post-rebuild path drops table AND files
    Tombstones.clear(spark, prefix)
    assert(Tombstones.read(spark, prefix).isEmpty)
    assert(!fs.exists(loc), "clear must remove the files too")
    // ... so a second clear/read cannot resurrect anything
    assert(Tombstones.read(spark, prefix).isEmpty)
  }

  test("mass-purge guard: an over-threshold tombstone set drops the " +
    "broadcast hint (planner's choice) and probes stay correct") {
    val prefix = "graft_spec_ts_guard"
    val data = (0L until 40L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    Tombstones.write(spark, prefix, (0L until 20L).toDF("doc_id"), "doc_id")
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    try {
      // small set (threshold above it): the hint is present — bucketed
      // index scans keep their partitioning under the broadcast
      spark.conf.set("graft.tombstones.broadcastMaxIds", "100")
      val small = Tombstones.filter(spark, prefix, data, "doc_id")
      assert(hinted(small), "small delete sets must broadcast")
      assert(small.select("doc_id").as[Long].collect().toSet ==
        (20L until 40L).toSet)
      // mass purge (threshold below the set): the hint must be DROPPED —
      // the planner picks, degrading to a shuffled anti-join instead of
      // materializing the wave on every executor (the GDPR-batch case)
      spark.conf.set("graft.tombstones.broadcastMaxIds", "10")
      val big = Tombstones.filter(spark, prefix, data, "doc_id")
      assert(!hinted(big),
        "an over-threshold tombstone set must not carry a broadcast hint")
      assert(big.select("doc_id").as[Long].collect().toSet ==
        (20L until 40L).toSet, "probes stay correct on the unhinted path")
      // the snapshot path takes the same guard
      val snap = Tombstones.snapshot(spark, prefix)
      assert(!hinted(Tombstones.filterWith(data, snap, "doc_id")))
      snap.foreach(Checkpoints.release)
    } finally spark.conf.unset("graft.tombstones.broadcastMaxIds")
  }

  test("the probe-path guard is free: the counting job runs at mutation " +
    "time, not per tombstone-filtered read") {
    val prefix = "graft_spec_ts_guard_free"
    val data = (0L until 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // the mutation (under its lock) pre-computes the guard verdict
    Tombstones.write(spark, prefix, (0L until 5L).toDF("doc_id"), "doc_id")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // plan-construction of the probe path: previously paid one
      // limit-count job per read; with the mutation-refreshed cache it
      // must run ZERO jobs (and the snapshot cut is job-free too, bar
      // its pin materialization)
      val filtered = Tombstones.filter(spark, prefix, data, "doc_id")
      // sentinel job: listener events process in order, so once it is
      // observed, any job the probe path had started was counted first.
      // An RDD count is exactly ONE job (a SQL count would be 2+ under
      // AQE and muddy the arithmetic).
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(jobs.get() == 1,
        s"probe-path construction must start no job (sentinel only), " +
          s"saw ${jobs.get()}")
      // guard verdict still applied: the small set carries the hint
      assert(filtered.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"))
      assert(filtered.select("doc_id").as[Long].collect().toSet ==
        (5L until 20L).toSet)
    } finally spark.sparkContext.removeSparkListener(listener)

    // a hinted snapshot must still release its pinned storage — the
    // broadcast wrapper cannot hide the checkpoint leaf from release
    val before = spark.sparkContext.getPersistentRDDs.size
    val snap = Tombstones.snapshot(spark, prefix)
    assert(snap.isDefined)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "snapshot must pin")
    snap.foreach(Checkpoints.release)
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.size > before &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release must free a broadcast-hinted snapshot's pinned blocks")
  }

  test("adopt heals every crash window of the aside-swap protocol — the " +
    "durable copy is never lost before the table write commits") {
    def loc(prefix: String) = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          Tombstones.tableName(prefix))))
    def aside(prefix: String) = {
      val l = loc(prefix)
      new org.apache.hadoop.fs.Path(l.getParent, s"${l.getName}__swap")
    }
    val fs = loc("x").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids(prefix: String): Set[Long] = Tombstones.read(spark, prefix)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)

    // crash after the rename, before the table write: aside alone
    val p1 = "graft_spec_ts_heal1"
    Seq(7L).toDF("id").write.parquet(aside(p1).toString)
    assert(ids(p1) == Set(7L), "aside alone must re-register whole")
    assert(!fs.exists(aside(p1)), "the healed aside is dropped")

    // crash DURING the table write: aside (whole) + location (torn —
    // here a subset); the aside is authoritative, the location drops
    val p2 = "graft_spec_ts_heal2"
    Seq(7L, 8L).toDF("id").write.parquet(aside(p2).toString)
    Seq(7L).toDF("id").write.parquet(loc(p2).toString)
    assert(ids(p2) == Set(7L, 8L),
      "the committed aside must win over a torn location")

    // crash after the commit, before the aside delete, with the table
    // REGISTERED: folding the aside back in is the always-safe resolution
    val p3 = "graft_spec_ts_heal3"
    Tombstones.write(spark, p3, Seq(1L).toDF("id"), "id")
    Seq(9L).toDF("id").write.parquet(aside(p3).toString)
    assert(ids(p3) == Set(1L, 9L))
    assert(!fs.exists(aside(p3)))
  }

  test("deferred retire: stageRetire keeps markers live for the staging " +
    "batch; retirePending applies them only from a strictly later batch") {
    val prefix = "graft_spec_ts_defer"
    Tombstones.write(spark, prefix, Seq(1L, 2L).toDF("id"), "id")
    val snap = Tombstones.snapshot(spark, prefix)
    Tombstones.stageRetire(spark, prefix, snap, batchId = 5L)
    def ids(): Set[Long] = Tombstones.read(spark, prefix)
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)
    assert(ids() == Set(1L, 2L),
      "staging must not retire — a replay of batch 5 still needs the markers")
    assert(Tombstones.hasPending(spark, prefix, 6L))
    assert(!Tombstones.hasPending(spark, prefix, 5L),
      "nothing is due before the staging batch itself")
    // a replayed stage 5 re-stages idempotently
    Tombstones.stageRetire(spark, prefix, snap, batchId = 5L)
    // batch 5's entry: nothing due (only a LATER batch proves commit)
    Tombstones.retirePending(spark, prefix, beforeBatch = 5L)
    assert(ids() == Set(1L, 2L))
    // a marker written after the snapshot survives the deferred retire
    Tombstones.write(spark, prefix, Seq(3L).toDF("id"), "id")
    Tombstones.retirePending(spark, prefix, beforeBatch = 6L)
    assert(ids() == Set(3L), "only the staged snapshot retires")
    assert(!Tombstones.hasPending(spark, prefix, Long.MaxValue))
    // idempotent re-run (the crash-between-retire-and-delete window)
    Tombstones.retirePending(spark, prefix, beforeBatch = 6L)
    assert(ids() == Set(3L))
  }

  test("single-writer contract: a second concurrent maintenance call " +
    "fails fast with a named error; a stale lock clears explicitly") {
    val prefix = "graft_spec_ts_lock"
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      MaintenanceLock.withLock(spark, prefix) {
        entered.countDown(); release.await()
      })
    holder.start(); entered.await()
    try {
      // writes, retires and a second lock all fail fast while held
      intercept[MaintenanceLock.ConcurrentMaintenanceException] {
        Tombstones.write(spark, prefix, Seq(1L).toDF("id"), "id")
      }
      intercept[MaintenanceLock.ConcurrentMaintenanceException] {
        MaintenanceLock.withLock(spark, prefix) { fail("must not enter") }
      }
    } finally { release.countDown(); holder.join() }
    // released: the same calls now succeed (protocols unchanged)
    Tombstones.write(spark, prefix, Seq(1L).toDF("id"), "id")
    assert(Tombstones.read(spark, prefix).isDefined)
    // reentrancy: nested protocols under one driver thread are fine
    MaintenanceLock.withLock(spark, prefix) {
      Tombstones.retire(spark, prefix, Tombstones.snapshot(spark, prefix))
    }
    assert(Tombstones.read(spark, prefix).isEmpty)
    // a lock file left by a CRASHED driver (no live holder in this JVM)
    // also fails fast — and clears only via the explicit recovery call.
    // Its heartbeat (here: the bare file's mtime) is FRESH, so the
    // recovery call refuses until the staleness window passes — forcing
    // out a possibly-live owner is the corruption the lock prevents.
    val path = MaintenanceLock.lockPath(spark, prefix)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .createNewFile(path)
    intercept[MaintenanceLock.ConcurrentMaintenanceException] {
      MaintenanceLock.withLock(spark, prefix) { fail("must not enter") }
    }
    intercept[IllegalStateException] {
      MaintenanceLock.forceRelease(spark, prefix)
    }
    // past the staleness window the same lock reads as STALE: the
    // fail-fast names it, and the recovery call now clears it
    spark.conf.set("graft.maintenance.lockStaleMs", "0")
    try {
      val e = intercept[MaintenanceLock.ConcurrentMaintenanceException] {
        MaintenanceLock.withLock(spark, prefix) { fail("must not enter") }
      }
      assert(e.getMessage.contains("STALE"), e.getMessage)
      MaintenanceLock.forceRelease(spark, prefix)
    } finally spark.conf.unset("graft.maintenance.lockStaleMs")
    MaintenanceLock.withLock(spark, prefix) { /* lock again: healed */ }
  }

  test("lock records its owner; heartbeat keeps it live; fresh refuses force") {
    val prefix = "graft_spec_ts_lock_owner"
    val entered = new java.util.concurrent.CountDownLatch(1)
    val beaten = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      MaintenanceLock.withLock(spark, prefix) {
        entered.countDown()
        beaten.await()
        MaintenanceLock.heartbeat(spark, prefix) // owner refresh: allowed
        release.await()
      }, "spec-lock-owner")
    holder.start(); entered.await()
    try {
      val path = MaintenanceLock.lockPath(spark, prefix)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val before = MaintenanceLock.readOwner(fs, path)
      assert(before.pid == ProcessHandle.current().pid(),
        s"lock must record this JVM's pid: $before")
      assert(before.thread == "spec-lock-owner", before.toString)
      // a non-owner thread cannot heartbeat a lock it does not hold
      intercept[IllegalArgumentException] {
        MaintenanceLock.heartbeat(spark, prefix)
      }
      Thread.sleep(5)
      beaten.countDown()
      // wait until the owner's refresh lands, then compare timestamps
      val deadline = System.currentTimeMillis() + 5000
      var after = MaintenanceLock.readOwner(fs, path)
      while (after.heartbeatMs <= before.heartbeatMs &&
        System.currentTimeMillis() < deadline) {
        Thread.sleep(10); after = MaintenanceLock.readOwner(fs, path)
      }
      assert(after.heartbeatMs > before.heartbeatMs,
        s"heartbeat must advance: $before -> $after")
    } finally { beaten.countDown(); release.countDown(); holder.join() }
  }

  test("winnow index: delete -> probe miss, compact -> physically gone") {
    val prefix = "graft_spec_ts_winnow"
    Dedup.writeWinnowIndex(docs, "doc_id", "text", k = 3, w = 4, seed = 7,
      maxDf = 10L, prefix = prefix, buckets = 4)
    val batchFps = docs.filter($"doc_id" === 2L)
      .select(col("doc_id"), explode(
        Dedup.winnowFingerprints(words(col("text")), 3, 4, 7)).as("fp"))
    def hits(): Set[Long] =
      Dedup.probeWinnowIndex(spark, prefix, batchFps, "doc_id",
        minShared = 1L).select("id_old").as[Long].collect().toSet
    assert(hits().contains(1L), "pre-delete probe must hit doc 1")

    Tombstones.write(spark, prefix, Seq(1L).toDF("doc_id"), "doc_id")
    assert(!hits().contains(1L) && hits().contains(2L))
    // the tombstone anti-join must not cost the index its bucketed
    // partitioning: the broadcast side is the delete set, so the
    // postings still read co-partitioned and the probe adds no
    // corpus-side fp exchange
    val probePlan = Dedup.probeWinnowIndex(spark, prefix, batchFps,
      "doc_id", minShared = 1L).queryExecution.executedPlan.toString
    assert(probePlan.contains("Bucketed: true"),
      s"tombstoned probe must keep the bucketed scan:\n$probePlan")
    assert("Exchange hashpartitioning\\(fp".r.findAllIn(probePlan).size <= 1,
      s"tombstone filter must not re-shuffle the postings on fp:\n$probePlan")

    Dedup.compactWinnowIndex(spark, prefix, "doc_id", buckets = 4)
    assert(!spark.catalog.tableExists(Tombstones.tableName(prefix)))
    assert(!spark.table(s"${prefix}_winnow")
      .select("doc_id").as[Long].collect().contains(1L))
    assert(!hits().contains(1L) && hits().contains(2L))
  }

  test("bm25 index: delete -> probe miss; compact re-derives stats " +
    "exactly as a fresh build over the surviving corpus") {
    val prefix = "graft_spec_ts_bm25"
    Retrieval.writeBm25Index(docs, "doc_id", "text", prefix, buckets = 4)
    val queries = Seq((1L, "alpha")).toDF("query_id", "term")
    def hits(): Set[Long] =
      Retrieval.probeBm25Index(spark, prefix, "doc_id", queries, k = 5)
        .select("doc_id").as[Long].collect().toSet
    assert(hits() == Set(1L, 2L), s"pre-delete: ${hits()}")

    Tombstones.write(spark, prefix, Seq(1L).toDF("doc_id"), "doc_id")
    assert(hits() == Set(2L), s"post-delete: ${hits()}")

    Retrieval.compactBm25Index(spark, prefix, "doc_id", buckets = 4)
    assert(!spark.catalog.tableExists(Tombstones.tableName(prefix)))
    assert(hits() == Set(2L), s"post-compaction: ${hits()}")
    // stats parity: the compacted index == a fresh build on docs - {1}
    Retrieval.writeBm25Index(docs.filter($"doc_id" =!= 1L), "doc_id",
      "text", "graft_spec_ts_bm25_fresh", buckets = 4)
    val compacted = spark.table(s"${prefix}_terms")
      .orderBy("term").collect().toSeq
    val fresh = spark.table("graft_spec_ts_bm25_fresh_terms")
      .orderBy("term").collect().toSeq
    assert(compacted == fresh,
      "compacted idf/avgdl must equal the fresh-build stats")
  }

  test("ivf index: delete -> candidate gone, compact -> physically gone; " +
    "centroids untouched") {
    val prefix = "graft_spec_ts_ivf"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(d => (((seed * 31 + d * 17) % 97) / 97.0f) - 0.5f)
    val corpus = (0L until 20L).map(i => (i, vec(i.toInt)))
      .toDF("cand_id", "cv")
    val centroids = (0 until 3).map(c => (c.toLong, vec(1000 + c)))
      .toDF("centroid_id", "centroid_vec")
    Similarity.writeIvfIndex(corpus, centroids, prefix, buckets = 4)
    val probes = Seq((100L, vec(5))).toDF("probe_id", "pv")
    def hits(): Set[Long] = {
      val (cent, lists) = Similarity.readIvfIndex(spark, prefix)
      Similarity.knnIvfIndexed(probes, cent, lists, k = 20, nprobe = 3)
        .select("cand_id").as[Long].collect().toSet
    }
    assert(hits().contains(5L), "pre-delete probe must reach vector 5")

    Tombstones.write(spark, prefix, Seq(5L).toDF("cand_id"), "cand_id")
    assert(!hits().contains(5L), "tombstoned vector must stop matching")
    assert(hits().nonEmpty, "other vectors must keep matching")

    Similarity.compactIvfIndex(spark, prefix, buckets = 4)
    assert(!spark.catalog.tableExists(Tombstones.tableName(prefix)))
    assert(!spark.table(s"${prefix}_lists")
      .select("cand_id").as[Long].collect().contains(5L))
    assert(!hits().contains(5L) && hits().nonEmpty)
    assert(spark.table(s"${prefix}_centroids").count() == 3,
      "the frozen quantizer must survive compaction")
  }
}
