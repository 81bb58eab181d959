package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dec

/** Round-11 query surface, part 13: the last two relational closures —
  * TPC-H Q4 (EXISTS-gated priority census) and a revenue-concentration
  * Pareto audit. Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries19 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------- q148_priority_late
  /** TPC-H Q4 shape: orders (one quarter) with at least one late
    * lineitem (shipped > 60 days after the order date), counted by
    * priority — the correlated-EXISTS census. The EXISTS is a LEFT
    * SEMI join of the filtered orders against the late lineitems:
    * each side's predicate reaches its own scan, the fact table never
    * duplicates an order however many late items it has, and the
    * census is an O(priorities) aggregate.
    */
  val q148PriorityLate = QueryDef(
    "q148_priority_late",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      val late = t(s, dir, "lineitem")
        .join(ord.select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .select($"l_orderkey")
      ord.join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // --------------------------------------------------- q149_revenue_concentration
  /** Revenue Pareto audit: what share of total revenue comes from the
    * top 1% / 5% / 20% of customers — the concentration number behind
    * key-account risk and the customer-side twin of q139's part-value
    * cut. The head sizes DERIVE from the customer count
    * (`ceil(p·n)` — integer-exact in both engines, the q139 derived-
    * threshold discipline); per-customer revenue partial-aggs from one
    * fact pass. Round-12: ranks come from a RANGE-PARTITIONED global
    * row number — the [[graft.operators.Percentiles.exactCont]]
    * machinery inlined: range-repartition on (revenue desc, custkey),
    * pin (range boundaries sample nondeterministically, the
    * TokenBudget hazard), per-partition counts fold to broadcast
    * offsets (an O(partitions) frame — the one remaining unpartitioned
    * window, over ≤ `spark.sql.shuffle.partitions` rows), and rank =
    * offset + in-partition row_number. The previous
    * `row_number().over(Window.orderBy(...))` + `partitionBy(lit(0))`
    * totals dragged the whole customer frame (customers ∝ corpus)
    * through ONE task; now totals attach as a broadcast one-row
    * aggregate and the head sums fold in the final O(1)-row aggregate.
    * Ranks are exact, so the oracle is unchanged.
    */
  val q149RevenueConcentration = {
    val Pcts = Seq(1, 5, 20)
    QueryDef(
      "q149_revenue_concentration",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Checkpoints
        val pc = t(s, dir, "orders")
          .groupBy($"o_custkey").agg(sum(dec($"o_totalprice")).as("_v"))
        val tot = pc.agg(count(lit(1)).as("_n"), sum($"_v").as("_tot"))
        val parts = Checkpoints.pin(
          pc.repartitionByRange($"_v".desc, $"o_custkey")
            .withColumn("_pid", spark_partition_id()))
        val wOff = Window.orderBy($"_pid")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = parts.groupBy($"_pid").agg(count(lit(1)).as("_c"))
          .select($"_pid",
            coalesce(sum($"_c").over(wOff), lit(0L)).as("_off"))
        val rk = parts
          .withColumn("_r", row_number().over(
            Window.partitionBy($"_pid").orderBy($"_v".desc, $"o_custkey")))
          .join(broadcast(offsets), "_pid")
          .select($"_v", ($"_off" + $"_r").as("_rn"))
          .crossJoin(broadcast(tot))
        val aggCols = max($"_n").as("n_customers") +:
          max(round($"_tot".cast("double"), 4)).as("total_rev") +:
          Pcts.map(p => sum(when($"_rn" <= ceil($"_n" * p / 100.0), $"_v"))
            .as(s"head$p"))
        val a = rk.agg(aggCols.head, aggCols.tail: _*)
        a.select(explode(array(Pcts.map(p =>
            struct(lit(p.toLong).as("top_pct"), $"n_customers",
              ceil($"n_customers" * p / 100.0).cast("long").as("head_n"),
              round(col(s"head$p").cast("double"), 4).as("head_rev"),
              round(col(s"head$p").cast("double")
                / $"total_rev", 6).as("rev_share"))): _*)).as("x"))
          .select($"x.top_pct", $"x.n_customers", $"x.head_n",
            $"x.head_rev", $"x.rev_share")
          .orderBy($"top_pct")
      },
      Some(s"""
        WITH pc AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS v
          FROM orders GROUP BY 1),
        rk AS (
          SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, o_custkey) AS rn,
                 COUNT(*) OVER () AS n, SUM(v) OVER () AS tot
          FROM pc),
        a AS (
          SELECT MAX(n) AS n_customers,
                 MAX(round(CAST(tot AS DOUBLE), 4)) AS total_rev,
                 ${Pcts.map(p =>
                   s"SUM(CASE WHEN rn <= ceil(n * $p / 100.0) THEN v END) AS head$p")
                 .mkString(", ")}
          FROM rk)
        ${Pcts.map(p => s"""
          SELECT CAST($p AS BIGINT) AS top_pct,
                 CAST(n_customers AS BIGINT) AS n_customers,
                 CAST(ceil(n_customers * $p / 100.0) AS BIGINT) AS head_n,
                 round(CAST(head$p AS DOUBLE), 4) AS head_rev,
                 round(CAST(head$p AS DOUBLE) / total_rev, 6) AS rev_share
          FROM a""").mkString(" UNION ALL ")}
        ORDER BY top_pct"""))
  }

  def all: Seq[QueryDef] = Seq(q148PriorityLate, q149RevenueConcentration)
}
