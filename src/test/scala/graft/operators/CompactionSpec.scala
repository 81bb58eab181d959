package graft.operators

import graft.SparkSpec

/** [[Compaction.compactDir]] (atomic small-file rewrite) and
  * [[Dedup.compactBandIndex]] (dedup of at-least-once index appends).
  */
class CompactionSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.functions.GraftFunctions.words

  test("compactDir: many small files -> few, data identical, rerun no-op") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    (1L to 1000L).toDF("v").repartition(20).write.parquet(dir)
    val before = spark.read.parquet(dir)
      .agg(count(lit(1)), sum($"v")).collect().head

    val (n0, n1) = Compaction.compactDir(spark, dir)
    assert(n0 == 20 && n1 == 1, s"($n0, $n1)")
    val after = spark.read.parquet(dir)
      .agg(count(lit(1)), sum($"v")).collect().head
    assert(after == before)
    assert(Compaction.compactDir(spark, dir) == (1, 1), "rerun must no-op")
  }

  test("compactBatchTree: folds committed batches, merged reads unchanged, appends still work") {
    import graft.streaming.StreamingHeavyHitters
    val dir = java.nio.file.Files.createTempDirectory("cbt").toString + "/cms"
    for (b <- 0L to 3L)
      StreamingHeavyHitters.writeBatch(
        Seq.fill(3)(s"k$b").toDF("key"), "key", dir, 3, 64, b)
    val before = StreamingHeavyHitters.sketch(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val (n0, n1) = Compaction.compactBatchTree(spark, dir)
    assert(n0 == 4 && n1 == 2, s"($n0, $n1)")
    val after = StreamingHeavyHitters.sketch(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(after == before, "folding partitions must not change the merged sketch")
    assert(Compaction.compactBatchTree(spark, dir) == (2, 2), "rerun must no-op")

    // the newest partition stayed replayable AND new appends keep a
    // consistent partitioned layout (the property compactDir would break)
    StreamingHeavyHitters.writeBatch(
      Seq.fill(3)("k3").toDF("key"), "key", dir, 3, 64, 3L) // replay last
    StreamingHeavyHitters.writeBatch(
      Seq("k9").toDF("key"), "key", dir, 3, 64, 4L) // fresh append
    val merged = StreamingHeavyHitters.sketch(spark, dir)
    import graft.operators.CountMin
    val est = CountMin.estimate(
        Seq("k0", "k3", "k9").toDF("key"), $"key", merged, 3, 64, "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("k0" -> 3L, "k3" -> 3L, "k9" -> 1L),
      s"post-compaction replay + append must stay exact: $est")
  }

  test("maybeCompactBatchTree: no-op at or under the bound, folds above it") {
    import graft.streaming.StreamingHeavyHitters
    val dir = java.nio.file.Files.createTempDirectory("mcbt").toString + "/cms"
    assert(Compaction.maybeCompactBatchTree(spark, dir, 4) == (0, 0),
      "absent tree is a free no-op")
    for (b <- 0L to 3L)
      StreamingHeavyHitters.writeBatch(
        Seq.fill(2)(s"k$b").toDF("key"), "key", dir, 3, 64, b)
    assert(Compaction.maybeCompactBatchTree(spark, dir, 4) == (4, 4),
      "at the bound: listing only, no fold")
    StreamingHeavyHitters.writeBatch(
      Seq("k4").toDF("key"), "key", dir, 3, 64, 4L)
    assert(Compaction.maybeCompactBatchTree(spark, dir, 4) == (5, 2),
      "over the bound: the fold runs")
    intercept[IllegalArgumentException] {
      Compaction.maybeCompactBatchTree(spark, dir, 1)
    }
  }

  test("compactBatchTree: foreign batch= names are skipped, not a crash") {
    import graft.streaming.StreamingHeavyHitters
    val dir = java.nio.file.Files.createTempDirectory("cbtf").toString + "/cms"
    for (b <- 0L to 3L)
      StreamingHeavyHitters.writeBatch(
        Seq.fill(2)(s"k$b").toDF("key"), "key", dir, 3, 64, b)
    // a non-numeric batch= directory dropped in by some other tool
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "batch=stray"))
    val (n0, n1) = Compaction.compactBatchTree(spark, dir)
    assert(n0 == 4 && n1 == 2, s"foreign dir must not count or throw: ($n0, $n1)")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "batch=stray")), "foreign dir left alone")
  }

  test("compactBatchTree: crashed folds recover without loss or double-count") {
    import graft.streaming.StreamingHeavyHitters
    import org.apache.hadoop.fs.Path
    def build(): String = {
      val d = java.nio.file.Files.createTempDirectory("cbtr").toString + "/cms"
      for (b <- 0L to 3L)
        StreamingHeavyHitters.writeBatch(
          Seq.fill(2)(s"k$b").toDF("key"), "key", d, 3, 64, b)
      d
    }
    def total(d: String): Long = StreamingHeavyHitters.sketch(spark, d)
      .agg(sum($"cnt")).collect().head.getLong(0)
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

    // crash BEFORE the consolidated rename: originals stranded in old,
    // target missing from the tree → recovery must restore them whole
    val d1 = build()
    val expect = total(d1)
    fs.mkdirs(new Path(d1 + "._compact_old"))
    for (b <- 0 to 2) // the would-be folded set, target = 2
      fs.rename(new Path(s"$d1/batch=$b"),
        new Path(d1 + s"._compact_old/batch=$b"))
    val (r0, r1) = Compaction.compactBatchTree(spark, d1)
    assert((r0, r1) == (4, 2), s"recovered run must then fold: ($r0, $r1)")
    assert(total(d1) == expect, "no rows may be lost across crash recovery")

    // crash AFTER the consolidated rename (old not yet deleted): the
    // held originals are duplicates → recovery must NOT restore them
    val d2 = build()
    val expect2 = total(d2)
    assert(Compaction.compactBatchTree(spark, d2) == (4, 2))
    // simulate: re-create old holding copies of the folded originals
    fs.mkdirs(new Path(d2 + "._compact_old"))
    StreamingHeavyHitters.writeBatch(
      Seq.fill(2)("k0").toDF("key"), "key", d2 + "._compact_old", 3, 64, 0L)
    StreamingHeavyHitters.writeBatch(
      Seq.fill(2)("k1").toDF("key"), "key", d2 + "._compact_old", 3, 64, 1L)
    StreamingHeavyHitters.writeBatch(
      Seq.fill(2)("k2").toDF("key"), "key", d2 + "._compact_old", 3, 64, 2L)
    assert(Compaction.compactBatchTree(spark, d2) == (2, 2))
    assert(total(d2) == expect2,
      "committed-fold recovery must drop the held duplicates, not restore them")
  }

  test("compactBandIndex: replayed appends deduplicate; bucketing survives") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
    val bands = Dedup.lshBands(
      sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig")),
      "doc_id", "sig", bands = 4, rowsPerBand = 2)
    Dedup.writeBandIndex(bands, sh, "doc_id", "graft_spec_compact", buckets = 4)

    // simulate an at-least-once replay: append the same rows again
    def replay(df: org.apache.spark.sql.DataFrame, table: String, key: String): Unit =
      df.write.mode("append").format("parquet")
        .bucketBy(4, key).sortBy(key).saveAsTable(table)
    replay(bands, "graft_spec_compact_bands", "band_key")
    replay(sh, "graft_spec_compact_shingles", "doc_id")
    assert(spark.table("graft_spec_compact_shingles").count() == 4)

    Dedup.compactBandIndex(spark, "graft_spec_compact", buckets = 4)
    assert(spark.table("graft_spec_compact_shingles").count() == 2)
    assert(spark.table("graft_spec_compact_bands").count() == bands.count())
    // still a bucketed table after the rewrite
    val ddl = spark.sql("DESCRIBE EXTENDED graft_spec_compact_bands")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(ddl.contains("band_key") && ddl.toLowerCase.contains("bucket"), ddl)
  }
}
