package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** One declared query per implemented operator (SURVEY.md §2 inventory,
  * re-expressed Spark-first over the driver testdata), each with an ANSI-SQL
  * oracle the driver runs in DuckDB.
  *
  * Oracle-parity rules used throughout (the driver hash-compares values):
  *  - numeric aggregates go through exact DECIMAL sums and are cast to
  *    DOUBLE at the end — order-independent, bit-identical in both engines;
  *  - every query ends in a total ORDER BY over a unique key set, and the
  *    oracle SQL carries the same ORDER BY;
  *  - aliases match between the Spark plan and the SQL;
  *  - no raw floating-point arithmetic whose evaluation order could differ.
  */
case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    notes: String = "")

object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------- q1_agg
  /** Grouped aggregation with partial (map-side) combine — SURVEY §2.5
    * A1-A3/A7. TPC-H-Q1-shaped pricing summary.
    */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double"), 4).as("sum_disc_price"),
          (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ------------------------------------------------------------- q2_filter
  /** Selective filter + narrow projection — SURVEY §2.2 P1 / §2.3. Both the
    * predicate and the 4-column ReadSchema must reach the Parquet scan.
    */
  val q2Filter = QueryDef(
    "q2_filter",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" <= lit("1996-03-31").cast("timestamp") &&
          $"l_quantity" >= 45)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <= TIMESTAMP '1996-03-31 00:00:00'
        AND l_quantity >= 45
      ORDER BY l_orderkey, l_linenumber"""))

  // ----------------------------------------------------------- q3_join_agg
  /** Multi-way equi-join with broadcast dims — revenue by nation for one
    * region/year. lineitem⨝orders shuffles on the fact keys; customer,
    * nation, region broadcast (SURVEY §2.4 absences → generalized engine).
    */
  val q3JoinAgg = QueryDef(
    "q3_join_agg",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter($"r_name" === "ASIA")
      // customer scales with sf (150k rows at sf100) — no broadcast hint;
      // AQE picks the strategy. nation/region are fixed 25/5 rows: hint OK.
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(
          round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },
    Some("""
      SELECT n_name,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name"""))

  // ---------------------------------------------------------- q4_semi_join
  /** LEFT SEMI join (EXISTS) — SURVEY §2.4 J1-family. */
  val q4Semi = QueryDef(
    "q4_semi_join",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val heavy = t(s, dir, "lineitem").filter($"l_quantity" > 49)
      ord.join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------- q5_anti_join
  /** LEFT ANTI join (NOT EXISTS) — the reference's pre-flight dedup shape
    * (SURVEY §2.4 J1: main.py:49-58 anti-joins new URLs against the store).
    */
  val q5Anti = QueryDef(
    "q5_anti_join",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord95 = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      cust.join(ord95, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_acctbal"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers,
             round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // -------------------------------------------------------------- q6_topk
  /** Global top-k (ORDER BY + LIMIT → TakeOrderedAndProject, no full sort)
    * — SURVEY §2.8 T1/T2.
    */
  val q6TopK = QueryDef(
    "q6_topk",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""))

  // ---------------------------------------------------------- q7_win_rank
  /** Ranking window — top-3 orders per customer (SURVEY §2.5 A6 argmax /
    * §2.8 T2 as a window).
    */
  val q7WinRank = QueryDef(
    "q7_win_rank",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  // ------------------------------------------------------- q8_win_running
  /** Frame window — running quantity per supplier over ship time
    * (SURVEY §2.10 generalization; exact decimal running sum).
    */
  val q8WinRunning = QueryDef(
    "q8_win_running",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter($"l_suppkey" < 20)
        .withColumn("run_qty", sum(dec($"l_quantity")).over(w).cast("double"))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          to_date($"l_shipdate").as("ship_date"), $"run_qty")
        .orderBy($"l_suppkey", $"ship_date", $"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS ship_date,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                  OVER (PARTITION BY l_suppkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
      FROM lineitem
      WHERE l_suppkey < 20
      ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber"""))

  /** Registry — SparkEntry derives its maps from this. */
  def all: Seq[QueryDef] = Seq(
    q1Agg, q2Filter, q3JoinAgg, q4Semi, q5Anti, q6TopK, q7WinRank, q8WinRunning)
}
