package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval / range join: pair each probe row with the candidate rows of
  * the same key whose timestamp falls in `[probeTs - windowSec, probeTs)`
  * — "events in the hour before each purchase".
  *
  * A naive `ON key AND c.ts BETWEEN ...` theta-join degenerates to a
  * per-key cross product (Spark plans it as a broadcast nested loop or a
  * shuffled cartesian within keys) — quadratic per key, a 100 TB killer.
  * This is the bucketized formulation:
  *
  *  - candidates get ONE bucket `floor(ts / windowSec)`;
  *  - probes join buckets `{b-1, b}` (an interval of length `windowSec`
  *    spans at most two consecutive buckets), via a 2-element explode;
  *  - equi-join on (keys..., bucket) — a plain shuffled hash join —
  *    then the exact residual predicate filters the pairs.
  *
  * Cost: shuffle of |probes| x 2 + |candidates| rows; join fan-in per
  * task is bounded by bucket population, not key population, so time-
  * skewed data still parallelizes. AQE skew-split applies as usual.
  */
object RangeJoin {

  /** @param probes     left side; all its columns survive
    * @param cands      right side; non-key columns attach as `prefix+name`
    * @param keys       equi-join keys present on both sides
    * @param probeTs    timestamp column name on `probes`
    * @param candTs     timestamp column name on `cands`
    * @param windowSec  lookback width in seconds (also the bucket width)
    * @return inner-join pairs: probe rows x candidates in
    *         `[probeTs - windowSec, probeTs)`; probes with no candidate
    *         drop out (left-join back for zero-count semantics)
    */
  def lookbackPairs(
      probes: DataFrame,
      cands: DataFrame,
      keys: Seq[String],
      probeTs: String,
      candTs: String,
      windowSec: Long,
      prefix: String = "cand_"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val B = "__range_bucket"
    val usec = windowSec * 1000000L

    val attach = cands.columns.filterNot(keys.contains).toSeq
    val c2 = cands.select(
      keys.map(col) ++
        Seq(floor(unix_micros(col(candTs)) / usec).as(B)) ++
        attach.map(a => col(a).as(prefix + a)): _*)
    val probeBucket = floor(unix_micros(col(probeTs)) / usec)
    val p2 = probes.withColumn(B,
      explode(array(probeBucket - 1, probeBucket)))

    p2.join(c2, keys :+ B)
      .filter(
        col(prefix + candTs) >= col(probeTs) - expr(s"INTERVAL $windowSec SECONDS") &&
          col(prefix + candTs) < col(probeTs))
      .drop(B)
  }
}
