package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dec

/** Round-11 query surface, part 10: deep multi-way relational shapes
  * over the full TPC-H-ish join graph — the planner-stress companions
  * to the q1–q8 core (6-table colocated join, yearly market share,
  * sole-late-supplier blame, value-concentration cut). Oracle-parity
  * rules as in [[Queries]]/[[Queries2]].
  */
object Queries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def revenue = round(
    sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .cast("double"), 4)

  private val sqlRev =
    "round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)"

  // ------------------------------------------------- q136_local_supplier_volume
  /** TPC-H Q5 proper (q3 is the customer-side half): revenue per
    * nation where the CUSTOMER and the SUPPLIER sit in the same
    * nation — the 6-table join whose planner shape matters at 100 TB:
    * the two fact-fact joins (lineitem⋈orders, then ⋈supplier) shuffle
    * on their keys, customer shuffles (sf-proportional, no hint — AQE
    * decides), nation/region broadcast as fixed-size dims, and the
    * same-nation predicate is a post-join filter on two already-joined
    * dim keys, never an extra join.
    */
  val q136LocalSupplierVolume = QueryDef(
    "q136_local_supplier_volume",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter($"r_name" === "ASIA")
      t(s, dir, "lineitem")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .filter($"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some(s"""
      SELECT n_name, $sqlRev AS revenue, COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE c_nationkey = s_nationkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ----------------------------------------------------------- q137_market_share
  /** TPC-H Q8 shape: per order year, the revenue share supplied from
    * EUROPE — numerator and denominator fold in ONE grouped pass via a
    * conditional sum (the two-branch draft would scan the join twice),
    * with the supplier→nation→region chain attached by broadcast dims
    * and the share an exact-decimal division per year row.
    */
  val q137MarketShare = QueryDef(
    "q137_market_share",
    (s, dir) => {
      import s.implicits._
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      val supReg = t(s, dir, "supplier")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"r_name")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(supReg, $"l_suppkey" === $"s_suppkey")
        .select(year($"o_orderdate").cast("long").as("o_year"),
          (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .as("_v"),
          $"r_name")
        .groupBy($"o_year")
        .agg(
          round(sum(when($"r_name" === "EUROPE", $"_v")).cast("double"), 4)
            .as("europe_rev"),
          round(sum($"_v").cast("double"), 4).as("total_rev"))
        .select($"o_year", $"europe_rev", $"total_rev",
          round($"europe_rev" / $"total_rev", 6).as("mkt_share"))
        .orderBy($"o_year")
    },
    Some("""
      WITH r AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS v,
               r_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey),
      g AS (
        SELECT o_year,
               round(CAST(SUM(CASE WHEN r_name = 'EUROPE' THEN v END)
                 AS DOUBLE), 4) AS europe_rev,
               round(CAST(SUM(v) AS DOUBLE), 4) AS total_rev
        FROM r GROUP BY 1)
      SELECT o_year, europe_rev, total_rev,
             round(europe_rev / total_rev, 6) AS mkt_share
      FROM g ORDER BY o_year"""))

  // ------------------------------------------------------ q138_late_sole_supplier
  /** TPC-H Q21 shape on the available columns: suppliers who were the
    * SOLE late shipper (l_shipdate > o_orderdate + 90 days) on a
    * multi-supplier order — the blame query whose classic form is two
    * correlated EXISTS/NOT-EXISTS; here both collapse into ONE grouped
    * pass over the joined facts (per-order distinct-supplier and
    * distinct-late-supplier counts), then a semi-ish join back to the
    * qualifying (order, supplier) pairs. Top-10 by blame count,
    * TakeOrdered.
    */
  val q138LateSoleSupplier = QueryDef(
    "q138_late_sole_supplier",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"),
          ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
            .as("late"))
      val perOrder = li.groupBy($"ok").agg(
        countDistinct($"sk").as("n_supp"),
        countDistinct(when($"late", $"sk")).as("n_late_supp"))
      val blame = li.filter($"late").select($"ok", $"sk").distinct()
        .join(perOrder.filter($"n_supp" >= 2 && $"n_late_supp" === 1), "ok")
      blame
        .join(t(s, dir, "supplier"), $"sk" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_orders".desc, $"s_name")
        .limit(10)
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk,
               l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      po AS (
        SELECT ok, COUNT(DISTINCT sk) AS n_supp,
               COUNT(DISTINCT CASE WHEN late THEN sk END) AS n_late_supp
        FROM li GROUP BY 1),
      blame AS (
        SELECT DISTINCT li.ok, li.sk
        FROM li JOIN po USING (ok)
        WHERE li.late AND po.n_supp >= 2 AND po.n_late_supp = 1)
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM blame JOIN supplier ON sk = s_suppkey
      GROUP BY s_name ORDER BY n_orders DESC, s_name LIMIT 10"""))

  // ------------------------------------------------------- q139_part_value_share
  /** TPC-H Q11 shape (value concentration): parts whose revenue share
    * exceeds 1.5× the mean share — the threshold DERIVES from the
    * distinct-part count in the same window pass (a fixed 0.1% cut is
    * a hand-set dial that silently returns nothing once the catalog
    * grows — measured empty here at sf0.01; the autoPlanes lesson).
    * Per-part partial-agg sums; the global total and part count attach
    * as a broadcast ONE-ROW aggregate (round-12: the previous
    * unpartitioned window dragged the whole parts frame — parts ∝
    * scale factor — through a single task; the one-row agg partial-aggs
    * in place and Spark's ReuseExchange computes the per-part shuffle
    * once for both branches), top-20 by value. The 100 TB story: the
    * fact table shuffles once on l_partkey; everything after is
    * parts-sized and never single-threaded.
    */
  val q139PartValueShare = QueryDef(
    "q139_part_value_share",
    (s, dir) => {
      import s.implicits._
      val perPart = t(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .as("_v"))
      val tot = perPart.agg(sum($"_v").as("_tot"),
        count(lit(1)).as("_np"))
      perPart
        .crossJoin(broadcast(tot))
        .select($"l_partkey",
          round($"_v".cast("double"), 4).as("value"),
          round($"_v".cast("double") / $"_tot".cast("double"), 9).as("share"),
          round(lit(1.5) / $"_np", 9).as("_thr"))
        .filter($"share" > $"_thr")
        .join(broadcast(t(s, dir, "part")
          .select($"p_partkey", $"p_name")), $"l_partkey" === $"p_partkey")
        .select($"p_name", $"value", round($"share", 6).as("share"))
        .orderBy($"value".desc, $"p_name")
        .limit(20)
    },
    Some("""
      WITH pp AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS v
        FROM lineitem GROUP BY 1),
      tot AS (SELECT SUM(v) AS t, COUNT(*) AS np FROM pp),
      sh AS (
        SELECT l_partkey, round(CAST(v AS DOUBLE), 4) AS value,
               round(CAST(v AS DOUBLE) / CAST(t AS DOUBLE), 9) AS share,
               round(1.5 / np, 9) AS thr
        FROM pp, tot)
      SELECT p_name, value, round(share, 6) AS share
      FROM sh JOIN part ON l_partkey = p_partkey
      WHERE share > thr
      ORDER BY value DESC, p_name LIMIT 20"""))

  def all: Seq[QueryDef] = Seq(q136LocalSupplierVolume, q137MarketShare,
    q138LateSoleSupplier, q139PartValueShare)
}
