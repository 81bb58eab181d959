package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative rank propagation over distributed edge lists — the graph
  * family beyond [[Dedup.connectedComponents]]' reachability: weighted
  * damped PageRank (Page et al., "The PageRank Citation Ranking",
  * Stanford InfoLab 1999), the centrality signal behind host-level
  * quality weighting in web-scale corpus curation (Common Crawl host
  * ranks) and canonical-source selection in duplication graphs.
  *
  * Reference anchor: the reference pipeline ranks sources by simple
  * per-source hit counts (`app/report/weekly.py`-style counts); rank
  * propagation is the north-star generalization — authority flows
  * along edges instead of stopping at degree.
  */
object Graphs {

  /** Rank unit: ranks are carried as integer NANO-units (1e-9). */
  final val Scale = 1000000000L

  /** Weighted, damped PageRank for a FIXED iteration count with exact
    * dangling-mass redistribution. Input: a directed edge list with a
    * non-negative weight column (multi-edges allowed — weights of
    * parallel edges add). Damping is the rational `dampNum/dampDen`
    * (default 17/20 = 0.85). Output: `(node, rank)`, one row per
    * distinct endpoint, `rank` the nano-unit count divided once into a
    * double.
    *
    * Determinism contract — the q60 centi-nat discipline, scaled up:
    * ranks live as integer nanos and every iteration step is EXACT
    * integer arithmetic with half-up integer division
    * (`(2a + b) DIV 2b`), so no per-iteration result ever sits near a
    * float rounding boundary:
    * {{{
    *   ratio_n  = round(Scale * w / W)                   // once, scale-0
    *   rank0_n  = (2*Scale + n) DIV (2*n)
    *   c(u→v)   = (rank_n(u) * ratio_n + Scale/2) DIV Scale
    *   dang_n   = (2*Σ_{W(u)=0} rank_n(u) + n) DIV (2*n)
    *   rank'_n  = base_n + (2*num*(Σc + dang_n) + den) DIV (2*den)
    *   base_n   = (2*(den-num)*Scale + den*n) DIV (2*den*n)
    * }}}
    * The one scale-0 float round (`ratio_n`) is safe cross-engine:
    * both engines evaluate the same IEEE division and round the SAME
    * double to an integer, and integer rounding of a double never
    * disagrees between binary-value and shortest-repr semantics (a
    * half-boundary is itself a representable double). round-9 of
    * products of quantized values — the naive float formulation —
    * disagrees constantly, because `num/den × k·1e-9` lands exactly on
    * half-boundaries.
    *
    * Scale shape: the edge set is normalized once (one groupBy to fold
    * parallel edges + one to attach out-weight shares, both map-side
    * combined) and pinned; each iteration is ONE equi-join of ranks to
    * edges on `src` and ONE hash aggregation on `dst` — the same
    * shuffle key every round, so a cluster deployment that
    * pre-partitions `ew` by `src` pays no edge shuffle after round
    * one. `n` and the dangling mass ride as broadcast one-row
    * aggregates (never a driver collect), and every round is pinned
    * via [[Checkpoints.pin]] (lineage truncation + reliable-checkpoint
    * durability on clusters) with the previous pin released — bounded
    * storage across iterations, the [[Similarity.kmeansGrouped]]
    * contract. Overflow headroom: `rank_n ≤ Scale`, `ratio_n ≤ Scale`,
    * so the contribution product is ≤ 1e18 < 2^63.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int,
               dampNum: Int = 17, dampDen: Int = 20): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampDen > dampNum,
      "damping num/den must satisfy 0 < num < den")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .groupBy(col("src"), col("dst"))
      .agg(decSum(col("w")).as("w"))
    val outW = e0.groupBy(col("src")).agg(decSum(col("w")).as("_W"))
    // out-weight shares in nanos, fixed for the whole run: pin once
    val ew = Checkpoints.pin(e0.join(outW, "src")
      .select(col("src"), col("dst"),
        round(lit(Scale.toDouble) * col("w") / col("_W"), 0)
          .cast("long").as("ratio_n")))
    val nodes = Checkpoints.pin(
      ew.select(col("src").as("node"))
        .union(ew.select(col("dst").as("node"))).distinct())
    val nn = broadcast(nodes.agg(count(lit(1)).as("_nl")))
    val halfUpByN = s"(2 * _s + _nl) DIV (2 * _nl)"
    var ranks = Checkpoints.pin(nodes.crossJoin(nn)
      .select(col("node"),
        expr(s"(2 * ${Scale}L + _nl) DIV (2 * _nl)").as("rank_n"),
        col("_nl")))
    for (_ <- 0 until iters) {
      // dangling nodes = no out-edges; their whole mass teleports
      val dang = broadcast(ranks // ranks carries _nl on every row
        .join(ew.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .agg(sum(col("rank_n")).as("_s"), first(col("_nl")).as("_nl"))
        .select(coalesce(expr(halfUpByN), lit(0L)).as("_dang")))
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          expr(s"(rank_n * ratio_n + ${Scale / 2}L) DIV ${Scale}L").as("_c"))
        .groupBy(col("dst"))
        .agg(sum(col("_c")).as("_s"))
      val next = Checkpoints.pin(nodes.crossJoin(nn)
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(dang)
        .select(col("node"),
          expr(s"""(2 * ${dampDen - dampNum} * ${Scale}L + $dampDen * _nl)
                     DIV (2 * $dampDen * _nl)
                   + (2 * $dampNum * (coalesce(_s, 0L) + _dang) + $dampDen)
                     DIV (2 * $dampDen)""").as("rank_n"),
          col("_nl")))
      Checkpoints.release(ranks)
      ranks = next
    }
    ranks.select(col("node"),
      (col("rank_n").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Exact, order-free sum: DECIMAL(27,12) accumulate, DOUBLE out. */
  private def decSum(c: Column): Column =
    sum(c.cast("decimal(27,12)")).cast("double")
}
