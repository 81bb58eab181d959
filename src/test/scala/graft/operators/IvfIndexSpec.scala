package graft.operators

import graft.SparkSpec

/** [[Similarity.writeIvfIndex]]/[[Similarity.knnIvfIndexed]]: the
  * disk-indexed probe must return exactly what the direct [[Similarity.knnIvf]]
  * computes, and must read the inverted lists as a bucketed scan with no
  * corpus-side shuffle (the index's whole point).
  */
class IvfIndexSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(d => (((seed * 31 + d * 17) % 97) / 97.0f) - 0.5f)

  test("indexed probe == direct knnIvf; lists read bucketed, no corpus-side shuffle") {
    val corpus = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("cand_id", "cv")
    val centroids = (0 until 4)
      .map(c => (c.toLong, vec(1000 + c))).toDF("centroid_id", "centroid_vec")
    val probes = (100L until 103L).map(i => (i, vec(i.toInt))).toDF("probe_id", "pv")

    Similarity.writeIvfIndex(corpus, centroids, "graft_spec_ivf", buckets = 4)
    val (cent, lists) = Similarity.readIvfIndex(spark, "graft_spec_ivf")

    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val indexed = Similarity.knnIvfIndexed(probes, cent, lists, k = 3)
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"inverted lists must be read as a bucketed scan:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"want exactly 1 cell exchange (probe side), got $cellExchanges:\n$plan")

      val direct = Similarity.knnIvf(probes, corpus, centroids, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val fromDisk = indexed
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(fromDisk == direct && direct.nonEmpty, s"$fromDisk vs $direct")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }
}
