package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles (linear interpolation — the
  * `quantile_cont` / Spark `percentile` definition) WITHOUT the built-in
  * aggregate's scale hazard: `percentile()` materializes a per-group
  * value map on a single reducer, so memory grows with the largest
  * group — at 100 TB a 3-group aggregation puts ~33 B values on one
  * task. Here no task ever holds more than one partition:
  *
  *  1. range-partition on (group, value) — rows of a group are spread
  *     over many partitions but ordered ACROSS partitions by value;
  *  2. per-(partition, group) counts → per-group prefix offsets (a
  *     tiny ≤ partitions+groups relation, windowed on the driver-free
  *     plan) — the same two-phase prefix-sum shape as
  *     [[TokenBudget]], with zero driver collects;
  *  3. global rank of a row = group offset of its partition + its
  *     row_number within (partition, group);
  *  4. the target ranks (floor/ceil of `1 + p·(n−1)` per group and
  *     requested p) are a groups×ps×2 relation, broadcast into an
  *     equi-join that picks exactly the needed rows, then interpolate.
  *
  * Cost: ONE full shuffle of (group, value) pairs (the range sort) +
  * one window shuffle, both balanced by partition — never by group.
  * Exactness: rank selection is exact; ties in value make the rank →
  * value mapping deterministic regardless of tie order. To take
  * percentiles of SEVERAL value columns in one pass, melt them into
  * (group…, metric, value) rows and put the metric column in
  * `groupCols` (q35 does this) — one scan and one range shuffle total.
  */
object Percentiles {

  /** Where threshold-style percentile consumers get their cut-points —
    * the operator-level dial q161 proved out (round 13) and q94/q140
    * previously hardwired to the exact form:
    *
    *  - [[ExactThresholds]]: the [[exactCont]] distributed rank
    *    selection — ONE range exchange of the whole (group, value)
    *    relation, exact to the `quantile_cont` definition, hash-parity
    *    replayable by a SQL oracle. The right source when the
    *    thresholds themselves are the deliverable.
    *  - [[SketchThresholds]]: the GK sketch (`percentile_approx`) —
    *    O(accuracy) state per partition, merges associatively map-side,
    *    NO range exchange anywhere. Rank error ≤ n/accuracy. The right
    *    source at 100 TB when the thresholds only FEED a bucketing
    *    (curriculum buckets, RFM cuts): cut-points need not be exact,
    *    and the range exchange is the plan's dominant shuffle.
    *
    * Both return the same relation shape, so a consumer swaps sources
    * without rewriting its bucketing (q94 ↔ q161 are the worked pair).
    */
  sealed trait ThresholdSource

  /** [[exactCont]]-backed thresholds (range exchange, hash-exact). */
  case object ExactThresholds extends ThresholdSource

  /** GK-sketch thresholds (`percentile_approx`, rank error ≤
    * n/accuracy, no range exchange) — the 100 TB default for
    * threshold-fed bucketing.
    */
  final case class SketchThresholds(accuracy: Int = 10000)
    extends ThresholdSource

  /** Percentile thresholds of `valueCol` per `groupCols` from the
    * chosen [[ThresholdSource]], in [[exactCont]]'s long format
    * `(groupCols…, p, value)` — the ONE code path the exact consumers
    * (q94 curriculum, q140 RFM) and the sketch consumer (q161) share,
    * so the at-scale swap is a one-argument change at the call site.
    * Null values are skipped and all-null groups produce no rows under
    * both sources.
    */
  def thresholds(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 ps: Seq[Double], source: ThresholdSource): DataFrame =
    source match {
      case ExactThresholds => exactCont(df, groupCols, valueCol, ps)
      case SketchThresholds(accuracy) =>
        require(accuracy >= 1, "accuracy must be >= 1")
        require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
          "percentiles must be in [0, 1]")
        val g = groupCols.map(col)
        df.select(g :+ col(valueCol).cast("double").as("_v"): _*)
          .filter(col("_v").isNotNull)
          .groupBy(g: _*)
          .agg(percentile_approx(col("_v"), array(ps.map(lit): _*),
            lit(accuracy)).as("_t"))
          .select(g :+ posexplode(col("_t")).as(Seq("_i", "value")): _*)
          .select(g ++ Seq(
            element_at(typedLit(ps), col("_i") + 1).as("p"),
            col("value")): _*)
    }

  /** Exact interpolated percentiles of `valueCol` per `groupCols`
    * combination. Returns the long-format relation
    * `(groupCols…, p, value)` with one row per (group, requested
    * percentile); null values are skipped (the `quantile_cont` /
    * `percentile` convention) and groups with no non-null values
    * produce no rows. NULL group-key values form their own group,
    * exactly like `groupBy` + the built-in aggregate (the internal
    * joins are null-safe). Group column names must not collide with
    * the internal `_v/_pid/_rank/p/value` columns.
    *
    * `broadcastTargets` (default true) broadcast-hints the two
    * rank-lookup relations, whose size is O(groups × partitions) and
    * O(groups × ps) — right for the few-group shape this operator
    * exists for (the built-in aggregate's worst case). With VERY
    * high-cardinality groups pass false and let the planner pick a
    * shuffled join; at that cardinality also consider whether plain
    * `percentile()` suffices (groups are small then).
    */
  def exactCont(df: DataFrame, groupCols: Seq[String], valueCol: String,
                ps: Seq[Double], broadcastTargets: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "percentiles must be in [0, 1]")
    val g = groupCols.map(col)
    val data = df
      .select(g :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    // pinned: consumed by both the count pass and the rank pass, and
    // repartitionByRange samples boundaries nondeterministically — a
    // recomputation could assign rows to DIFFERENT partitions between
    // the two passes, corrupting every offset (the TokenBudget hazard)
    val parts = data
      .repartitionByRange(g :+ col("_v"): _*)
      .withColumn("_pid", spark_partition_id())
      .pipe(Checkpoints.pin)

    val pg = parts.groupBy(col("_pid") +: g: _*).agg(count(lit(1)).as("_c"))
    val wOff = Window.partitionBy(g: _*).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pg.select(col("_pid") +: g ++: Seq(
      coalesce(sum("_c").over(wOff), lit(0L)).as("_off"),
      sum("_c").over(Window.partitionBy(g: _*)).as("_n")): _*)

    // target ranks per (group, p): 1-based rk = 1 + p·(n−1); the rows
    // at floor(rk) and ceil(rk) are the only ones the join keeps
    val targets = offsets.select(g :+ col("_n"): _*).distinct()
      .select(g ++ Seq(explode(array(ps.map(lit): _*)).as("p"),
        col("_n")): _*)
      .select(g ++ Seq(col("p"),
        (lit(1.0) + col("p") * (col("_n") - 1).cast("double")).as("_rk")): _*)
      .select(g ++ Seq(col("p"), col("_rk"),
        floor(col("_rk")).cast("long").as("_lo"),
        ceil(col("_rk")).cast("long").as("_hi")): _*)
    val needed = targets
      .select(g ++ Seq(col("p"), col("_rk"), col("_lo"), col("_hi"),
        explode(array(col("_lo"), col("_hi"))).as("_rank")): _*)
      .distinct() // lo == hi when rk is integral: one row serves both

    // null-safe group-key joins: a null group key is a real group for
    // groupBy/window/range-partition above, so the lookup joins must
    // not drop it (plain equi-join keys would). The lookup side renames
    // its keys and joins with <=>.
    def gAlias(df: DataFrame): DataFrame = groupCols.zipWithIndex
      .foldLeft(df) { case (d, (c, i)) => d.withColumnRenamed(c, s"_gk$i") }
    def gCond(extra: Column): Column = groupCols.indices
      .map(i => col(groupCols(i)) <=> col(s"_gk$i"))
      .foldLeft(extra)(_ && _)
    def hinted(df: DataFrame): DataFrame =
      if (broadcastTargets) broadcast(df) else df

    val wRn = Window.partitionBy(col("_pid") +: g: _*).orderBy("_v")
    val ranked = parts
      .withColumn("_rn", row_number().over(wRn))
      .join(hinted(gAlias(offsets.select(col("_pid") +: g :+ col("_off"): _*))
          .withColumnRenamed("_pid", "_gpid")),
        gCond(col("_pid") === col("_gpid")))
      .select(g ++ Seq(col("_v"), (col("_off") + col("_rn")).as("_rank")): _*)

    ranked.join(hinted(gAlias(needed).withColumnRenamed("_rank", "_nrank")),
        gCond(col("_rank") === col("_nrank")))
      .groupBy(g :+ col("p"): _*)
      .agg(
        min(when(col("_rank") === col("_lo"), col("_v"))).as("_vlo"),
        min(when(col("_rank") === col("_hi"), col("_v"))).as("_vhi"),
        first(col("_rk")).as("_frk"),
        first(col("_lo")).as("_flo"))
      .select(g ++ Seq(col("p"),
        (col("_vlo") +
          (col("_frk") - col("_flo").cast("double")) *
            (col("_vhi") - col("_vlo"))).as("value")): _*)
  }

  /** Single-group convenience overload. */
  def exactCont(df: DataFrame, groupCol: String, valueCol: String,
                ps: Seq[Double]): DataFrame =
    exactCont(df, Seq(groupCol), valueCol, ps)
}
