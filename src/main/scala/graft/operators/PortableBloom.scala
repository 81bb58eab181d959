package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Engine-portable Bloom filter for seen-key prefiltering (the J1/F4
  * anti-join at 100 TB — reference semantics: upsert.py:62 + main.py:53,
  * re-expressed as a sketch prefilter).
  *
  * The classic scale problem: anti-joining a 100 TB batch against a
  * large seen-key store shuffles BOTH sides on the key. A Bloom filter
  * of the store cuts that to (a) one broadcast of the filter and (b) an
  * exact anti-join over only the rows the filter flags — a set sized by
  * actual overlap + the false-positive residue, not by the batch. No
  * false negatives ever (a genuinely-new key can never be dropped); the
  * documented FP rate only costs extra rows in the small exact pass.
  *
  * Unlike `bloom_filter_agg`'s opaque binary sketch, the filter here is
  * RELATIONAL: the set-bit positions of `k` md5-derived hash functions
  * ([[graft.functions.GraftFunctions.hash64]] mod `mBits`), kept as a
  * `(bit)` table — at most `min(mBits, k·|seen|)` rows, broadcastable by
  * construction for any store a Bloom filter suits. Membership is `k`
  * broadcast LEFT joins (one per hash), so the probe side never
  * shuffles and stays whole-stage-codegen'd; and because the positions
  * are md5 arithmetic, a DuckDB oracle rebuilds the identical filter
  * bit-for-bit — hit/miss verdicts hash-match across engines, which an
  * opaque sketch can never do.
  */
object PortableBloom {

  /** Hash-function seeds are `seedBase + i` for `i < k`. */
  val DefaultSeedBase = 100

  /** Bit positions of `key` under `k` hash functions in a `mBits`-bit
    * filter: `hash64(key, seedBase+i) mod mBits` (hash64 is non-negative,
    * so the mod is too).
    */
  def bitPositions(key: Column, k: Int, mBits: Int,
                   seedBase: Int = DefaultSeedBase): Seq[Column] = {
    require(k >= 1, "k must be >= 1")
    require(mBits >= 2, "mBits must be >= 2")
    (0 until k).map(i => hash64(key, seedBase + i) % mBits)
  }

  /** Build the filter over `seen`'s `key` expression: the distinct set
    * of bit positions, as a single-column `(bit: long)` relation. One
    * partial-agg distinct over ≤ k·|seen| ints — broadcastable whenever
    * a Bloom filter makes sense at all.
    */
  def build(seen: DataFrame, key: Column, k: Int, mBits: Int,
            seedBase: Int = DefaultSeedBase): DataFrame =
    seen.select(explode(array(bitPositions(key, k, mBits, seedBase): _*))
      .as("bit")).distinct()

  /** Add a `hitCol` boolean to `probes`: true iff every one of `key`'s
    * `k` bit positions is set in `bits` (possible false positive, never
    * a false negative). Implemented as `k` broadcast LEFT joins — the
    * probe side stays map-only, no shuffle, no per-key aggregation.
    */
  def probe(probes: DataFrame, key: Column, bits: DataFrame, k: Int,
            mBits: Int, hitCol: String,
            seedBase: Int = DefaultSeedBase): DataFrame = {
    val marked = (0 until k).foldLeft(
      probes.withColumns((0 until k).map(i =>
        s"_bp$i" -> bitPositions(key, k, mBits, seedBase)(i)).toMap)) {
      (df, i) =>
        df.join(
          broadcast(bits.select(col("bit").as(s"_bp$i"),
            lit(1L).as(s"_bm$i"))),
          Seq(s"_bp$i"), "left")
    }
    marked
      .withColumn(hitCol,
        (0 until k).map(i => col(s"_bm$i").isNotNull).reduce(_ && _))
      .drop((0 until k).flatMap(i => Seq(s"_bp$i", s"_bm$i")): _*)
  }
}
