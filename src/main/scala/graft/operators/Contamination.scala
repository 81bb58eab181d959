package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Benchmark-decontamination for training corpora: q47 DETECTS overlap
  * between training documents and a held-out test set; this operator
  * also CUTS the contaminated documents, which is what a pipeline
  * actually ships. (Reference N/A — north-star LLM-pipeline depth; the
  * detection half is the q47 broadcast shingle probe.)
  *
  * Scale shape (unchanged from q47): the test set's shingle index is
  * small by construction (benchmarks are), so it broadcasts; the corpus
  * is probed map-side in one narrow pass, and only actual matches reach
  * the per-doc aggregation. The cut itself is a broadcast ANTI join
  * against the (tiny) contaminated-id list — the 100 TB side never
  * shuffles anywhere in the operator.
  */
object Contamination {

  /** Distinct 3-gram shingle hashes of `textCol` (the q47 portable
    * formula — md5 word hashes folded mod-2³⁰/mod-p, replayable in
    * DuckDB).
    */
  def shingleSet(textCol: Column): Column =
    array_distinct(Dedup.shingleHashes3(Dedup.wordHashes(words(textCol))))

  /** Per-document contamination scores of `corpus` against `testSet`
    * (both carrying `idCol` + `textCol`): returns
    * `(idCol, n_shared, n_shingles, overlap_frac)` for documents
    * sharing at least one shingle — identical output contract to q47,
    * reusable against any test-set relation.
    */
  def scores(corpus: DataFrame, testSet: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    val id = col(idCol)
    val testShingles = testSet
      .select(explode(shingleSet(col(textCol))).as("h")).distinct()
    corpus
      .select(id, shingleSet(col(textCol)).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(id, size(col("_sh")).cast("long").as("n_shingles"),
        explode(col("_sh")).as("h"))
      .join(broadcast(testShingles), "h")
      .groupBy(id, col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(id, col("n_shared"), col("n_shingles"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("overlap_frac"))
  }

  /** Remove from `corpus` every document whose shingle overlap with
    * `testSet` reaches `minOverlapFrac` — the decontamination cut.
    * Documents too short to shingle (< 3 tokens) cannot overlap and
    * are kept. Returns the surviving rows of `corpus` unchanged in
    * schema; the contaminated-id list is tiny (actual contamination,
    * not corpus size), so the anti join broadcasts.
    */
  def cut(corpus: DataFrame, testSet: DataFrame, idCol: String,
          textCol: String, minOverlapFrac: Double): DataFrame = {
    require(minOverlapFrac > 0.0 && minOverlapFrac <= 1.0,
      "minOverlapFrac must be in (0, 1]")
    val bad = scores(corpus, testSet, idCol, textCol)
      .filter(col("overlap_frac") >= minOverlapFrac)
      .select(col(idCol))
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }
}
