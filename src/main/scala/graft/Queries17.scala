package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dec

/** Round-11 query surface, part 11: customer-analytics and
  * market-structure operators over the order history — RFM
  * segmentation, basket affinity, lifetime-value cohorts, seasonality.
  * Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries17 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------ q140_rfm_segments
  /** RFM segmentation: every customer scored into recency / frequency
    * / monetary quartiles, then the 64-cell segment census — the
    * classic CRM partitioning. Round-12: quartiles are VALUE-threshold
    * cuts (the q94 scale-safe NTILE replacement) — the previous three
    * `ntile(4)` global windows dragged the whole customer frame
    * (customers ∝ corpus: 15 M at TPC-H sf100, billions at 100 TB)
    * through ONE task, three times. Now the three metrics melt into
    * (metric, value) rows and ONE bounded-memory distributed rank
    * selection ([[graft.operators.Percentiles.exactCont]], one range
    * exchange over 3n rows) yields nine round-6 thresholds that
    * broadcast onto a narrow per-row CASE — the customer frame never
    * re-shuffles to learn its buckets. Threshold semantics: ties share
    * a bucket (value-based, both engines cut on the same round-6
    * doubles via `quantile_cont` parity, the q94 discipline); quartile
    * 1 = most recent / most frequent / highest spend. At 100 TB even
    * the one range exchange goes: pass
    * `SketchThresholds` instead of `ExactThresholds` at the shared
    * operator seam ([[graft.operators.Percentiles.thresholds]], the
    * q94/q161 pair's one-argument swap — same broadcast-CASE
    * bucketing, rank-window contract instead of hash parity).
    */
  val q140RfmSegments = QueryDef(
    "q140_rfm_segments",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Percentiles
      val ord = t(s, dir, "orders")
        .select($"o_custkey", unix_micros($"o_orderdate").as("us"),
          dec($"o_totalprice").as("v"))
      val mx = ord.agg(max($"us").as("_mx"))
      val cust = ord.groupBy($"o_custkey").agg(
          max($"us").as("_last"), count(lit(1)).as("freq"),
          sum($"v").as("_mon"))
        .crossJoin(broadcast(mx))
        .select($"o_custkey",
          expr("(_mx - _last) div 86400000000").as("rec_days"),
          $"freq", $"_mon")
      val melted = cust.select(explode(array(
          struct(lit("r").as("metric"), $"rec_days".cast("double").as("mv")),
          struct(lit("f").as("metric"), $"freq".cast("double").as("mv")),
          struct(lit("m").as("metric"), $"_mon".cast("double").as("mv"))))
          .as("x"))
        .select($"x.metric", $"x.mv")
      val th = Percentiles.thresholds(melted, Seq("metric"), "mv",
          Seq(0.25, 0.5, 0.75), Percentiles.ExactThresholds)
        .groupBy($"metric")
        .agg(round(min(when($"p" === 0.25, $"value")), 6).as("t25"),
          round(min(when($"p" === 0.5, $"value")), 6).as("t50"),
          round(min(when($"p" === 0.75, $"value")), 6).as("t75"))
      val thRow = th.agg(
        min(when($"metric" === "r", $"t25")).as("r25"),
        min(when($"metric" === "r", $"t50")).as("r50"),
        min(when($"metric" === "r", $"t75")).as("r75"),
        min(when($"metric" === "f", $"t25")).as("f25"),
        min(when($"metric" === "f", $"t50")).as("f50"),
        min(when($"metric" === "f", $"t75")).as("f75"),
        min(when($"metric" === "m", $"t25")).as("m25"),
        min(when($"metric" === "m", $"t50")).as("m50"),
        min(when($"metric" === "m", $"t75")).as("m75"))
      val rfm = cust.crossJoin(broadcast(thRow))
        .select($"_mon",
          when($"rec_days".cast("double") <= $"r25", 1L)
            .when($"rec_days".cast("double") <= $"r50", 2L)
            .when($"rec_days".cast("double") <= $"r75", 3L)
            .otherwise(4L).as("r"),
          when($"freq".cast("double") > $"f75", 1L)
            .when($"freq".cast("double") > $"f50", 2L)
            .when($"freq".cast("double") > $"f25", 3L)
            .otherwise(4L).as("f"),
          when($"_mon".cast("double") > $"m75", 1L)
            .when($"_mon".cast("double") > $"m50", 2L)
            .when($"_mon".cast("double") > $"m25", 3L)
            .otherwise(4L).as("m"))
      rfm.groupBy($"r", $"f", $"m")
        .agg(count(lit(1)).as("n_customers"),
          round(sum($"_mon").cast("double"), 4).as("monetary"))
        .orderBy($"r", $"f", $"m")
    },
    Some("""
      WITH ord AS (
        SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS us,
               CAST(o_totalprice AS DECIMAL(18,4)) AS v
        FROM orders),
      mx AS (SELECT MAX(us) AS mxus FROM ord),
      cust AS (
        SELECT o_custkey, (mxus - MAX(us)) // 86400000000 AS rec_days,
               COUNT(*) AS freq, SUM(v) AS mon
        FROM ord, mx GROUP BY o_custkey, mxus),
      th AS (
        SELECT
          round(quantile_cont(CAST(rec_days AS DOUBLE), 0.25), 6) AS r25,
          round(quantile_cont(CAST(rec_days AS DOUBLE), 0.50), 6) AS r50,
          round(quantile_cont(CAST(rec_days AS DOUBLE), 0.75), 6) AS r75,
          round(quantile_cont(CAST(freq AS DOUBLE), 0.25), 6) AS f25,
          round(quantile_cont(CAST(freq AS DOUBLE), 0.50), 6) AS f50,
          round(quantile_cont(CAST(freq AS DOUBLE), 0.75), 6) AS f75,
          round(quantile_cont(CAST(mon AS DOUBLE), 0.25), 6) AS m25,
          round(quantile_cont(CAST(mon AS DOUBLE), 0.50), 6) AS m50,
          round(quantile_cont(CAST(mon AS DOUBLE), 0.75), 6) AS m75
        FROM cust),
      rfm AS (
        SELECT mon,
               CASE WHEN CAST(rec_days AS DOUBLE) <= r25 THEN 1
                    WHEN CAST(rec_days AS DOUBLE) <= r50 THEN 2
                    WHEN CAST(rec_days AS DOUBLE) <= r75 THEN 3
                    ELSE 4 END AS r,
               CASE WHEN CAST(freq AS DOUBLE) > f75 THEN 1
                    WHEN CAST(freq AS DOUBLE) > f50 THEN 2
                    WHEN CAST(freq AS DOUBLE) > f25 THEN 3
                    ELSE 4 END AS f,
               CASE WHEN CAST(mon AS DOUBLE) > m75 THEN 1
                    WHEN CAST(mon AS DOUBLE) > m50 THEN 2
                    WHEN CAST(mon AS DOUBLE) > m25 THEN 3
                    ELSE 4 END AS m
        FROM cust, th)
      SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
             CAST(m AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             round(CAST(SUM(mon) AS DOUBLE), 4) AS monetary
      FROM rfm GROUP BY r, f, m ORDER BY r, f, m"""))

  // ---------------------------------------------------------- q141_basket_affinity
  /** Market-basket affinity: part-brand pairs co-occurring in the same
    * order, ranked by lift `P(ab) / (P(a)·P(b))` with a support floor
    * — the recommendation / bundling signal. Pairs explode WITHIN an
    * order only (Σ|basket|² bounded by basket size, the q112 blocking
    * argument — never a catalog² cross); brand marginals partial-agg
    * from the same distinct (order, brand) frame, and the order count
    * folds from the marginal frame itself, never a second fact scan.
    */
  val q141BasketAffinity = QueryDef(
    "q141_basket_affinity",
    (s, dir) => {
      import s.implicits._
      val ob = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select($"p_partkey", $"p_brand")), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("ok"), $"p_brand").distinct()
      val marg = ob.groupBy($"p_brand").agg(count(lit(1)).as("n_b"))
      val nOrders = ob.groupBy($"ok").agg(count(lit(1)).as("_bs"))
        .agg(count(lit(1)).as("_n"))
      val pairs = ob.select($"ok", $"p_brand".as("b1"))
        .join(ob.select($"ok", $"p_brand".as("b2")), "ok")
        .filter($"b1" < $"b2")
        .groupBy($"b1", $"b2").agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= 20)
      pairs
        .join(broadcast(marg.select($"p_brand".as("b1"), $"n_b".as("_na"))),
          "b1")
        .join(broadcast(marg.select($"p_brand".as("b2"), $"n_b".as("_nb"))),
          "b2")
        .crossJoin(broadcast(nOrders))
        .select($"b1", $"b2", $"n_ab",
          round(($"n_ab".cast("double") * $"_n")
            / ($"_na".cast("double") * $"_nb"), 6).as("lift"))
        .orderBy($"lift".desc, $"b1", $"b2")
        .limit(20)
    },
    Some("""
      WITH ob AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      marg AS (SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT ok) AS n FROM ob),
      pairs AS (
        SELECT a.p_brand AS b1, b.p_brand AS b2, COUNT(*) AS n_ab
        FROM ob a JOIN ob b ON a.ok = b.ok AND a.p_brand < b.p_brand
        GROUP BY 1, 2 HAVING COUNT(*) >= 20)
      SELECT b1, b2, CAST(n_ab AS BIGINT) AS n_ab,
             round((CAST(n_ab AS DOUBLE) * n.n)
               / (CAST(ma.n_b AS DOUBLE) * mb.n_b), 6) AS lift
      FROM pairs
      JOIN marg ma ON ma.p_brand = b1
      JOIN marg mb ON mb.p_brand = b2
      CROSS JOIN n
      ORDER BY lift DESC, b1, b2 LIMIT 20"""))

  // ------------------------------------------------------------ q142_ltv_cohorts
  /** Lifetime-value cohorts: customers grouped by first-order year,
    * cumulative average spend per customer by order-age year — the
    * monetary twin of q126's retention triangle (does a newer cohort
    * monetize faster?). One fact pass + a per-customer min; the
    * triangle is a windowed cumsum over the O(years²) matrix with
    * cohort sizes attached by the same window, never a rescan.
    */
  val q142LtvCohorts = QueryDef(
    "q142_ltv_cohorts",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .select($"o_custkey", year($"o_orderdate").cast("long").as("yr"),
          dec($"o_totalprice").as("v"))
      val fe = ord.groupBy($"o_custkey").agg(min($"yr").as("y0"))
      val m = ord.join(fe, "o_custkey")
        .groupBy($"y0", ($"yr" - $"y0").as("age"))
        .agg(sum($"v").as("_rev"),
          countDistinct($"o_custkey").as("n_active"))
      val coh = Window.partitionBy($"y0")
      val cum = coh.orderBy($"age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      m.withColumn("_size",
          max(when($"age" === 0, $"n_active")).over(coh))
        .withColumn("_cumrev", sum($"_rev").over(cum))
        .select($"y0".as("cohort_year"), $"age", $"n_active",
          round($"_cumrev".cast("double") / $"_size", 4)
            .as("cum_ltv_per_customer"))
        .orderBy($"cohort_year", $"age")
    },
    Some("""
      WITH ord AS (
        SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(o_totalprice AS DECIMAL(18,4)) AS v
        FROM orders),
      fe AS (SELECT o_custkey, MIN(yr) AS y0 FROM ord GROUP BY 1),
      m AS (
        SELECT y0, yr - y0 AS age, SUM(v) AS rev,
               COUNT(DISTINCT ord.o_custkey) AS n_active
        FROM ord JOIN fe USING (o_custkey)
        GROUP BY 1, 2),
      w AS (
        SELECT y0, age, n_active,
               MAX(CASE WHEN age = 0 THEN n_active END)
                 OVER (PARTITION BY y0) AS size,
               SUM(rev) OVER (PARTITION BY y0 ORDER BY age
                 ROWS UNBOUNDED PRECEDING) AS cumrev
        FROM m)
      SELECT y0 AS cohort_year, age, CAST(n_active AS BIGINT) AS n_active,
             round(CAST(cumrev AS DOUBLE) / size, 4) AS cum_ltv_per_customer
      FROM w ORDER BY cohort_year, age"""))

  // ------------------------------------------------------------ q143_seasonality
  /** Revenue seasonality: month-of-year revenue shares plus a
    * chi-square statistic against the uniform month hypothesis — the
    * q110 shard-IID audit pointed at the time axis (is Q4 really
    * bigger, or is the year just noisy?). One fact pass partial-aggs
    * counts and exact-decimal revenue per month; the chi-square folds
    * over the O(12) frame with totals from the same window.
    */
  val q143Seasonality = QueryDef(
    "q143_seasonality",
    (s, dir) => {
      import s.implicits._
      val m = t(s, dir, "lineitem")
        .groupBy(month($"l_shipdate").cast("long").as("mo"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .as("_rev"))
      val all = Window.partitionBy(lit(0))
      m.withColumn("_tn", sum($"n_items").over(all))
        .withColumn("_exp", round($"_tn".cast("double") / 12, 9))
        .select($"mo", $"n_items",
          round($"_rev".cast("double"), 4).as("revenue"),
          round($"_rev".cast("double")
            / sum($"_rev").over(all).cast("double"), 6).as("rev_share"),
          round(($"n_items" - $"_exp") * ($"n_items" - $"_exp") / $"_exp", 6)
            .as("chi2_term"))
        .orderBy($"mo")
    },
    Some("""
      WITH m AS (
        SELECT CAST(month(l_shipdate) AS BIGINT) AS mo,
               COUNT(*) AS n_items,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        FROM lineitem GROUP BY 1),
      w AS (
        SELECT mo, n_items, rev,
               SUM(n_items) OVER () AS tn,
               SUM(rev) OVER () AS trev
        FROM m),
      e AS (
        SELECT mo, n_items, rev, trev,
               round(CAST(tn AS DOUBLE) / 12, 9) AS expn
        FROM w)
      SELECT mo, CAST(n_items AS BIGINT) AS n_items,
             round(CAST(rev AS DOUBLE), 4) AS revenue,
             round(CAST(rev AS DOUBLE) / CAST(trev AS DOUBLE), 6)
               AS rev_share,
             round((n_items - expn) * (n_items - expn) / expn, 6)
               AS chi2_term
      FROM e ORDER BY mo"""))

  def all: Seq[QueryDef] = Seq(q140RfmSegments, q141BasketAffinity,
    q142LtvCohorts, q143Seasonality)
}
