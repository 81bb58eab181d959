package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Engine-portable count-min sketch: approximate multiplicity counts in
  * `depth × width` cells — the streaming/heavy-hitter companion to the
  * exact q63 aggregation. One partial-agg pass builds the sketch (the
  * shuffle carries (row, bucket) cells — at most depth·width distinct
  * keys REGARDLESS of corpus size, the whole point at 100 TB);
  * estimates never undercount, and overcount is bounded by the
  * collision mass in the emptiest row.
  *
  * Like [[PortableBloom]], the sketch is RELATIONAL and md5-derived
  * ([[graft.functions.GraftFunctions.hash64]] row seeds `seedBase+r`),
  * so a DuckDB oracle rebuilds the identical cells and the estimates
  * hash-match across engines — an opaque sketch blob cannot do either.
  * Estimation is `depth` broadcast joins (the sketch is ≤ depth·width
  * rows by construction) + a `least(...)` over the row counts: the
  * probe side stays map-only.
  */
object CountMin {

  val DefaultSeedBase = 200

  /** Bucket of `key` in sketch row `r`. */
  def bucket(key: Column, r: Int, width: Int,
             seedBase: Int = DefaultSeedBase): Column =
    hash64(key, seedBase + r) % width

  /** Build the sketch over the multiset of `key` values in `items`:
    * one row per touched cell, `(r, bucket, cnt)`. Size ≤ depth·width
    * — broadcastable by construction for any practical sketch.
    */
  def build(items: DataFrame, key: Column, depth: Int, width: Int,
            seedBase: Int = DefaultSeedBase): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    items
      .select(posexplode(array((0 until depth).map(r =>
        bucket(key, r, width, seedBase)): _*)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[build]] from a pre-aggregated HISTOGRAM: `items` carries one row
    * per distinct key with its multiplicity `weight`, and the cells sum
    * weights instead of counting rows — `buildWeighted(hist(raw))`
    * equals `build(raw)` cell for cell (integer sums of the same
    * multiset), while each distinct key is md5-hashed `depth` times
    * once, instead of once per OCCURRENCE. Callers that already
    * aggregate the same keys exactly (q69's truth top-k) share the one
    * histogram pass between both consumers — guide §1.2, don't compute
    * things twice.
    */
  def buildWeighted(items: DataFrame, key: Column, weight: Column,
                    depth: Int, width: Int,
                    seedBase: Int = DefaultSeedBase): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    items
      .select(weight.as("_w"), posexplode(array((0 until depth).map(r =>
        bucket(key, r, width, seedBase)): _*)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("_w")).as("cnt"))
  }

  /** Attach `estCol` = the count-min estimate of each probe `key`:
    * `least` over the `depth` row cells the key hashes to. A key whose
    * cell was never touched estimates 0 (it never occurred). Probe side
    * is `depth` broadcast joins — map-only, no shuffle.
    */
  def estimate(probes: DataFrame, key: Column, sketch: DataFrame,
               depth: Int, width: Int, estCol: String,
               seedBase: Int = DefaultSeedBase): DataFrame = {
    val marked = (0 until depth).foldLeft(
      probes.withColumns((0 until depth).map(r =>
        s"_cb$r" -> bucket(key, r, width, seedBase)).toMap)) { (df, r) =>
      df.join(
        broadcast(sketch.filter(col("r") === r)
          .select(col("bucket").as(s"_cb$r"), col("cnt").as(s"_cc$r"))),
        Seq(s"_cb$r"), "left")
    }
    val rowCounts = (0 until depth).map(r => coalesce(col(s"_cc$r"), lit(0L)))
    // Spark's least() needs >= 2 args; depth = 1 is a legal sketch
    val est = if (depth == 1) rowCounts.head else least(rowCounts: _*)
    marked
      .withColumn(estCol, est)
      .drop((0 until depth).flatMap(r => Seq(s"_cb$r", s"_cc$r")): _*)
  }
}
