package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Similarity

case class VecIn(cand_id: Long, cv: Seq[Double])

/** [[StreamingVectorIndex]]: the streamed lists equal the one-shot
  * assignment of the concatenated stream, probes answer identically to
  * the direct IVF path, replay is idempotent, and the pre-commit read
  * is the empty index.
  */
class StreamingVectorIndexSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def cents = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("centroid_id", "centroid_vec")

  private val b1 = Seq(VecIn(1L, Seq(0.9, 0.1)), VecIn(2L, Seq(0.1, 0.8)))
  private val b2 = Seq(VecIn(3L, Seq(0.7, 0.2)), VecIn(4L, Seq(0.2, 0.9)),
    VecIn(5L, Seq(0.99, 0.01)))

  private def listRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"cell", $"cand_id", round($"_cn", 9).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed lists == one-shot assignment; probes answer identically") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("svi").toString
    val in = MemoryStream[VecIn]
    val q = StreamingVectorIndex.run(in.toDF(), cents,
      path = s"$dir/ivf", checkpoint = s"$dir/ckpt")
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingVectorIndex.lists(spark, s"$dir/ivf")
    val oneShot = Similarity
      .ivfAssign((b1 ++ b2).toDF(), "cv", "cand_id", cents)
      .withColumn("_cn", graft.functions.GraftFunctions.l2norm($"cv"))
    assert(listRows(streamed) == listRows(oneShot),
      "the streamed index must equal the one-shot assignment")

    val probes = Seq((10L, Seq(1.0, 0.05))).toDF("probe_id", "pv")
    val viaIndex = Similarity.knnIvfIndexed(probes, cents, streamed, k = 2)
      .select($"probe_id", $"rn", $"cand_id", $"cos").collect().toSeq
    val direct = Similarity.knnIvf(probes,
        (b1 ++ b2).toDF().select($"cand_id", $"cv"), cents, k = 2)
      .select($"probe_id", $"rn", $"cand_id", $"cos").collect().toSeq
    assert(viaIndex == direct,
      s"index probe must match the direct IVF path: $viaIndex vs $direct")
  }

  test("rebuildIndex: retrained centroids re-bucket the whole stream into " +
    "the writeIvfIndex layout; probes match the one-shot index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("svir").toString
    val in = MemoryStream[VecIn]
    val q = StreamingVectorIndex.run(in.toDF(), cents,
      path = s"$dir/ivf", checkpoint = s"$dir/ckpt")
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // the distribution drifted: retrain on everything accumulated so far
    val allVecs = (b1 ++ b2).toDF()
    val retrained = Similarity.kmeans(allVecs.select($"cand_id", $"cv"),
      "cv", "cand_id", k = 2, iters = 2, seed = 5)
    StreamingVectorIndex.rebuildIndex(spark, s"$dir/ivf", retrained,
      prefix = "graft_spec_svi_v2", buckets = 2)
    val (centsDisk, listsDisk) =
      Similarity.readIvfIndex(spark, "graft_spec_svi_v2")

    // the rebuilt lists equal a one-shot writeIvfIndex over the same
    // vectors and centroids…
    val oneShot = Similarity
      .ivfAssign(allVecs.select($"cand_id", $"cv"), "cv", "cand_id", retrained)
      .withColumn("_cn", graft.functions.GraftFunctions.l2norm($"cv"))
    assert(listRows(listsDisk) == listRows(oneShot),
      "rebuilt lists must equal the one-shot assignment under the new codebook")
    // …and probes served from the rebuilt catalog match the direct path
    val probes = Seq((10L, Seq(0.8, 0.3))).toDF("probe_id", "pv")
    val viaRebuilt = Similarity
      .knnIvfIndexed(probes, centsDisk, listsDisk, k = 2)
      .select($"probe_id", $"rn", $"cand_id", $"cos").collect().toSeq
    val direct = Similarity.knnIvf(probes,
        allVecs.select($"cand_id", $"cv"), retrained, k = 2)
      .select($"probe_id", $"rn", $"cand_id", $"cos").collect().toSeq
    assert(viaRebuilt == direct,
      s"rebuilt-index probe must match the direct path: $viaRebuilt vs $direct")
  }

  test("replayed batch overwrites its own partition — no duplicate entries") {
    val dir = java.nio.file.Files.createTempDirectory("svi2").toString
    StreamingVectorIndex.writeBatch(b1.toDF(), cents, s"$dir/ivf", batchId = 5L)
    StreamingVectorIndex.writeBatch(b1.toDF(), cents, s"$dir/ivf", batchId = 5L)
    val n = StreamingVectorIndex.lists(spark, s"$dir/ivf").count()
    assert(n == b1.size.toLong, s"replay must not duplicate list rows: $n")
  }

  test("index before any batch commits is empty") {
    val dir = java.nio.file.Files.createTempDirectory("svi0").toString
    assert(StreamingVectorIndex.lists(spark, s"$dir/ivf").count() == 0L)
  }

  test("template overload: pre- and post-commit schemas agree for any id type") {
    // string cand_id + double vectors — off the embeddings convention,
    // where the fixed pre-commit schema would mismatch the written one
    val dir = java.nio.file.Files.createTempDirectory("svi3").toString
    val strBatch = Seq(("a", Seq(0.9, 0.1)), ("b", Seq(0.1, 0.8)))
      .toDF("cand_id", "cv")
    val pre = StreamingVectorIndex.lists(spark, s"$dir/ivf", strBatch, cents)
    assert(pre.count() == 0L)
    StreamingVectorIndex.writeBatch(strBatch, cents, s"$dir/ivf", batchId = 0L)
    val post = StreamingVectorIndex.lists(spark, s"$dir/ivf", strBatch, cents)
    assert(post.count() == 2L)
    // union must resolve: the derived empty frame has the written types
    assert(pre.unionByName(post.select(pre.columns.map(col): _*)).count() == 2L)
    // simpleString: parquet reads arrays back element-nullable, which
    // unionByName reconciles — only the TYPES must agree
    assert(pre.schema.map(f => (f.name, f.dataType.simpleString)).toSet ==
      post.select(pre.columns.map(col): _*)
        .schema.map(f => (f.name, f.dataType.simpleString)).toSet)
  }

  test("tombstones cover the live view: base AND streamed vectors stop " +
    "matching probeLive; the rebuild drops them physically") {
    import graft.operators.Tombstones
    val dir = java.nio.file.Files.createTempDirectory("svid").toString
    val prefix = "graft_spec_svi_del"
    // base index: vectors 1, 2; streamed batch: vectors 3, 4, 5
    Similarity.writeIvfIndex(
      b1.toDF().select($"cand_id", $"cv"), cents, prefix, buckets = 2)
    StreamingVectorIndex.writeBatch(b2.toDF(), cents, s"$dir/ivf",
      batchId = 0L)
    val probes = Seq((100L, Seq(0.9, 0.2))).toDF("probe_id", "pv")
    def live(): Set[Long] =
      StreamingVectorIndex.probeLive(spark, prefix, s"$dir/ivf",
        probes, k = 10, nprobe = 2)
        .select("cand_id").as[Long].collect().toSet
    val pre = live()
    assert(pre == Set(1L, 2L, 3L, 4L, 5L), s"pre-delete: $pre")

    // delete one BASE vector (1) and one STREAMED vector (5)
    Tombstones.write(spark, prefix, Seq(1L, 5L).toDF("cand_id"), "cand_id")
    val post = live()
    assert(post == Set(2L, 3L, 4L), s"post-delete: $post")

    // full-corpus retrain over base ∪ streamed: the SURVIVING base
    // vector (2) must come along — deleted ones must not
    StreamingVectorIndex.rebuildIndex(spark, s"$dir/ivf", cents,
      s"${prefix}_v2", buckets = 2, basePrefix = Some(prefix))
    val rebuilt = spark.table(s"${prefix}_v2_lists")
      .select("cand_id").as[Long].collect().toSet
    assert(rebuilt == Set(2L, 3L, 4L),
      s"rebuilt lists must hold ALL survivors (base + streamed): $rebuilt")
  }
}
