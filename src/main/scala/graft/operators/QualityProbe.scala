package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dot

/** Trained linear quality probe — the LEARNABLE member of the quality
  * family (q13's heuristics are fixed formulas; q56 gates on them): fit
  * a least-squares linear scorer on weakly-labeled seed documents
  * (trusted source → 1, untrusted → 0 — the fastText-style quality-
  * classifier workflow every production curation pipeline runs), then
  * score the WHOLE corpus with the frozen weights as one narrow map
  * pass. Reference scope: the reference pipeline has no trained
  * scorer; this is north-star surface (quality filtering at corpus
  * scale).
  *
  * Determinism contract (the [[Similarity.kmeans]] discipline, so the
  * SQL oracle replays training bit-for-bit): the per-row prediction is
  * the SEQUENTIAL dot product ([[dot]] — same order-sensitive double
  * arithmetic as DuckDB's `list_reduce`), per-dimension gradients are
  * EXACT decimal sums (`decimal(27,12)` — float addition is
  * order-sensitive, a plain double sum would differ across
  * partitionings) divided by the training count and rounded to 9, and
  * the weight update rounds to 9 after the fixed-step move. Squared
  * loss on 0/1 labels rather than logistic: the gradient is pure
  * +/×/÷ arithmetic — a sigmoid would drag `exp` in, which is NOT
  * correctly-rounded cross-engine (the q60 centi-nat quantization
  * lesson); thresholding the linear score at 0.5 gives the same
  * keep/cut decision boundary mechanism.
  *
  * Scale shape: each GD iteration is one corpus-free pass over the
  * SEED set (narrow dot + posexplode + a `dims`-key aggregation with
  * map-side partial sums) and an O(dims) driver collect; scoring is
  * one literal-weight map pass over the corpus — no join, no shuffle.
  * Seeds are small by contract (they are hand-trusted sources); the
  * corpus never enters training.
  */
object QualityProbe {

  /** Train `iters` fixed-step gradient-descent rounds of a
    * least-squares linear model on `(xCol: array<double>, yCol:
    * double)` rows, starting from the zero vector. Returns the learned
    * weights — `dims` doubles, rounded to 9 places per update exactly
    * as the SQL oracle computes them.
    */
  def trainLinear(seed: DataFrame, xCol: String, yCol: String,
                  dims: Int, iters: Int, lr: Double): Array[Double] = {
    require(dims >= 1 && iters >= 0, "dims >= 1 and iters >= 0")
    def round9(v: Double): Double =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = Array.fill(dims)(0.0)
    for (_ <- 0 until iters) {
      val err = (dot(col(xCol), typedLit(w.toSeq)) - col(yCol)).as("_err")
      val grads = seed.select(col(xCol), err)
        .select(posexplode(col(xCol)).as(Seq("_d", "_xd")), col("_err"))
        .groupBy(col("_d"))
        .agg(round(sum((col("_xd") * col("_err")).cast("decimal(27,12)"))
          .cast("double") / count(lit(1)), 9).as("_g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.indices.map(d => round9(w(d) - lr * grads(d))).toArray
    }
    w
  }

  /** The frozen-weight score — `round(w · x, 6)`, a narrow literal
    * lookup like [[Similarity.pqCodeCol]]: no join, no shuffle, the
    * corpus is scored in one map pass.
    */
  def scoreCol(x: Column, w: Seq[Double]): Column =
    round(dot(x, typedLit(w)), 6)
}
