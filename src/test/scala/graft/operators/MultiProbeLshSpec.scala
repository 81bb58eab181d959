package graft.operators

import graft.SparkSpec

/** [[Similarity.knnLshMultiprobe]]: probing the least-confident plane
  * boundary must never lose recall vs single-probe LSH, and a corpus
  * vector must never appear twice for one probe (one bucket per corpus
  * vector — the probed buckets are distinct codes).
  */
class MultiProbeLshSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("recall@3 is monotone in nprobe; candidates never duplicate") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planes = Similarity.autoPlanes(e.count(), targetBucket = 64)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
    val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    val exact = Similarity.knnExact(probes, corpus, 3)
      .select($"probe_id", $"cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def hits(nprobe: Int): Int = {
      val rows = Similarity
        .knnLshMultiprobe(probes, corpus, 64, planes, k = 3, nprobe = nprobe)
        .select($"probe_id", $"cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.distinct.length == rows.length,
        s"nprobe=$nprobe produced duplicate (probe, cand) rows")
      rows.count(exact.contains)
    }
    val h1 = hits(1)
    val h2 = hits(2)
    assert(h2 >= h1, s"multiprobe lost recall: nprobe=2 hits $h2 < $h1")

    // nprobe=1 must be EXACTLY single-probe knnLsh
    val single = Similarity.knnLsh(probes, corpus, 64, planes, 3)
      .select($"probe_id", $"rn", $"cand_id").collect().map(_.toString).sorted
    val mp1 = Similarity.knnLshMultiprobe(probes, corpus, 64, planes, 3, nprobe = 1)
      .select($"probe_id", $"rn", $"cand_id").collect().map(_.toString).sorted
    assert(single.sameElements(mp1))
  }
}
