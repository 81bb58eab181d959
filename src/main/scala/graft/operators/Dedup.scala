package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale text corpora (SURVEY.md §0 north
  * star; the reference's only dedup is the URL anti-join, main.py:49-58 —
  * these generalize it to content dedup for training-data pipelines).
  *
  * Scale design: every operator here is either a hash-groupBy (one shuffle
  * on the dedup key) or a banded-LSH bucket join (shuffle on band key).
  * Nothing is ever all-pairs: candidate generation is O(docs × bands) and
  * the verify step runs only on within-bucket candidates.
  */
object Dedup {

  /** Exact dedup: one row per distinct `key(text)`, keeping the smallest id.
    * One shuffle, map-side partial agg. At 100 TB: the groupBy key is a
    * 128-bit content hash, so the shuffle carries (hash, id) pairs only,
    * never the document bodies.
    */
  def exact(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("content_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: array of `seeds` minima over the shingle set.
    * Pure codegen'd builtins (transform/array_min over the shingle array) —
    * no UDF, no explode; computed in one narrow pass over the corpus.
    */
  def minhashSig(shinglesCol: Column, seeds: Int): Column =
    array((0 until seeds).map(s => array_min(transform(shinglesCol, x => hash64(x, s)))): _*)

  /** Banded LSH: one row per (doc, band) with the band's bucket key.
    * `rowsPerBand` consecutive signature entries hash into one key; docs
    * agreeing on any band become candidates. Shuffle key = band_key.
    */
  def lshBands(sig: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandKey = (b: Int) =>
      md5(concat_ws("",
        lit(s"$b:"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          col(sigCol).getItem(b * rowsPerBand + r)): _*)))
    val perBand = (0 until bands).map { b =>
      sig.select(col(idCol), lit(b).as("band"), bandKey(b).as("band_key"))
    }
    perBand.reduce(_ unionByName _)
  }

  /** Candidate pairs from banded LSH: a self-join on (band, band_key) —
    * the shuffle co-locates each bucket, so pair generation is local to a
    * bucket and never quadratic in the corpus.
    */
  def lshCandidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val b = bands.select(col("band"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Jaccard similarity of two shingle-set columns (distinct semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** SimHash fingerprint over a token array: for each of `bits` bit
    * positions, sum +1/-1 votes from each token's hash; set the bit iff
    * the vote is positive. Tokens keep multiplicity (standard SimHash).
    * Vectorized per-row over the token array — no explode, no shuffle.
    */
  def simhash(tokens: Column, bits: Int, seed: Int): Column = {
    val hs = transform(tokens, w => hash64(w, seed))
    val bitVal = (0 until bits).map { b =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitVal.reduce(_ + _)
  }

  /** Prefix fingerprint: hash of the first `n` tokens — a cheap rolling-
    * hash-style document fingerprint for clustering boilerplate openings.
    */
  def prefixFingerprint(tokens: Column, n: Int, seed: Int): Column =
    hash64(concat_ws(" ", slice(tokens, 1, n)), seed)
}
