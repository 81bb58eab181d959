package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Unit tests for the dedup operator family — in particular the LSH
  * banding edge cases that the oracle queries don't exercise (they filter
  * short docs out before banding).
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("lshBands: null signature entries propagate to a NULL band_key") {
    // doc 1: normal; docs 2,3: <3 tokens → empty shingle array → array_min
    // null → every signature entry null. With concat_ws the two empty docs
    // would share one bucket and emit a bogus candidate pair; with
    // null-propagating concat they must not pair at all.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "tiny doc"),
      (3L, "small one")).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
    val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
    val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)

    val nullKeys = bands.filter($"band_key".isNull)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(nullKeys == Set(2L, 3L), "short docs must get null band keys")
    assert(bands.filter($"doc_id" === 1L && $"band_key".isNull).count() == 0)

    val pairs = Dedup.lshCandidatePairs(bands, "doc_id").collect()
    assert(pairs.isEmpty, "null-band docs must never become candidates")
  }

  test("lshBands: identical docs still collide per band") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
    val sig = sh.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig"))
    val bands = Dedup.lshBands(sig, "doc_id", "sig", bands = 4, rowsPerBand = 2)
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }
}
