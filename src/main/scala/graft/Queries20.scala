package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{dec, dsum}
import graft.operators.Multimodal

/** Round-12 query surface: the audio half of the multimodal column
  * family, plus the remaining classic TPC-H shapes expressible on this
  * schema (Q3, Q7, Q9*, Q10, Q13, Q14, Q18, Q19, Q22* — the starred
  * ones adapted where a column the spec needs, `partsupp` /
  * `c_phone`, does not exist in the testdata). Oracle-parity rules as
  * in [[Queries]]/[[Queries2]].
  */
object Queries20 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------- q150_audio_decode
  /** REAL audio decode ([[Multimodal.MediaCodecWav]]): mono PCM-16 WAV
    * payloads parsed by the pure-JVM RIFF kernel — decoded sample rate,
    * channel count, bit depth, frame count, integer-exact duration and
    * the mean absolute amplitude — with the deliberately TRUNCATED
    * payload (id 13) degrading to `decode_ok = false` nulls instead of
    * failing the partition. The synthetic WAVs encode an integer sample
    * formula losslessly ([[Multimodal.synthSample]]), so the codec-less
    * oracle predicts every decoded field arithmetically — the q33
    * cross-engine faithfulness check extended from stills to audio.
    * Scale shape: decode is a narrow partition-local map directly over
    * the payload scan (no payload bytes ever shuffle); only the
    * fixed-width feature rows reach the final sort.
    */
  val q150AudioDecode = QueryDef(
    "q150_audio_decode",
    (s, dir) => {
      import s.implicits._
      val audio = Multimodal.syntheticAudio(s, 60)
      Multimodal.decodeAudioFeatures(audio).toDF()
        .select($"media_id", $"decode_ok", $"sample_rate", $"channels",
          $"bits", $"n_samples", $"duration_ms",
          round($"mean_abs_amp", 6).as("mean_abs_amp"))
        .orderBy($"media_id")
    },
    Some(s"""
      WITH m AS (
        SELECT id, id % 50 + 20 AS n, (id % 60 != 13) AS ok
        FROM range(0, 60) t(id))
      SELECT id AS media_id, ok AS decode_ok,
             CAST(CASE WHEN ok THEN 8000 END AS INTEGER) AS sample_rate,
             CAST(CASE WHEN ok THEN 1 END AS INTEGER) AS channels,
             CAST(CASE WHEN ok THEN 16 END AS INTEGER) AS bits,
             CAST(CASE WHEN ok THEN n END AS BIGINT) AS n_samples,
             CAST(CASE WHEN ok THEN n * 1000 // 8000 END AS BIGINT)
               AS duration_ms,
             CASE WHEN ok THEN
               round(CAST(list_sum(list_transform(range(0, n),
                 j -> abs((id * 37 + j * 11) % 4096 - 2048))) AS DOUBLE)
                 / n, 6)
             END AS mean_abs_amp
      FROM m ORDER BY media_id"""))

  // ------------------------------------------------------ q151_shipping_priority
  /** TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    * segment-filtered customers drive orders placed before the cut
    * date, revenue counts only lineitems shipped after it. The
    * fact×fact join shuffles once on the order key (unavoidable in
    * Q3); the customer cut rides the orders join, revenue rounds to 4
    * BEFORE the rank so the LIMIT cut is tie-deterministic
    * cross-engine, and the top-10 is a TakeOrdered, never a global
    * sort.
    */
  val q151ShippingPriority = QueryDef(
    "q151_shipping_priority",
    (s, dir) => {
      import s.implicits._
      val cut = lit("1997-01-01").cast("timestamp")
      val cust = t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val ord = t(s, dir, "orders").filter($"o_orderdate" < cut)
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_orderdate")
      t(s, dir, "lineitem").filter($"l_shipdate" > cut)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
               AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // -------------------------------------------------------- q152_volume_shipping
  /** TPC-H Q7 shape: bilateral trade volume between two nations by ship
    * year — supplier nation on the lineitem side, customer nation via
    * orders. The nation-filtered supplier dim broadcasts; the customer
    * attach shuffles once on the customer key (customers ∝ corpus, so
    * never hint-broadcast); year filter reaches the lineitem scan.
    */
  val q152VolumeShipping = QueryDef(
    "q152_volume_shipping",
    (s, dir) => {
      import s.implicits._
      val nat = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      val supp = t(s, dir, "supplier")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .filter($"n_name".isin("NATION_1", "NATION_2"))
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(nat, $"c_nationkey" === $"n_nationkey")
        .filter($"n_name".isin("NATION_1", "NATION_2"))
        .select($"c_custkey", $"n_name".as("cust_nation"))
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double"), 4).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some("""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
               AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND sn.n_name IN ('NATION_1', 'NATION_2')
        AND cn.n_name IN ('NATION_1', 'NATION_2')
        AND sn.n_name != cn.n_name
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // -------------------------------------------------------- q153_product_profit
  /** TPC-H Q9 shape (adapted: the testdata has no `partsupp`, so the
    * supplycost subtraction is out of reach — the JOIN GRAPH and the
    * (nation, year) rollup are the shape): revenue from parts of one
    * type attributed to the supplier's nation by order year. Part and
    * supplier dims broadcast; the orders attach is the one fact×fact
    * shuffle.
    */
  val q153ProductProfit = QueryDef(
    "q153_product_profit",
    (s, dir) => {
      import s.implicits._
      val nat = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      val supp = t(s, dir, "supplier")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("nation"))
      val prt = t(s, dir, "part").filter($"p_type" === "PROMO")
        .select($"p_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(t(s, dir, "orders")
          .select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year")),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"nation", $"o_year")
        .agg(round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"nation", $"o_year")
    },
    Some("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
               AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_type = 'PROMO'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // --------------------------------------------------------- q154_returned_items
  /** TPC-H Q10 shape: customers who returned the most revenue in one
    * quarter. The classic plan inversion: aggregate per customer FIRST
    * (one fact shuffle), TakeOrdered the top-20, and only then attach
    * name / balance / nation — the 20-row cut broadcasts INTO the
    * customer dim, so the wide attributes never ride the fact
    * aggregation. Revenue rounds to 4 before the rank
    * (tie-deterministic cut).
    */
  val q154ReturnedItems = QueryDef(
    "q154_returned_items",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val top = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"o_custkey")
        .limit(20)
      t(s, dir, "customer")
        .join(broadcast(top), $"c_custkey" === $"o_custkey")
        .join(broadcast(t(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal",
          $"n_name")
        .orderBy($"revenue".desc, $"c_custkey")
    },
    Some("""
      WITH top AS (
        SELECT o_custkey,
               round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
                 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey LIMIT 20)
      SELECT c_custkey, c_name, revenue, c_acctbal, n_name
      FROM customer JOIN top ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY revenue DESC, c_custkey"""))

  // --------------------------------------------------- q155_order_count_histogram
  /** TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    * zero-order customers (the left join is the point — a groupBy of
    * orders alone never sees them). One orders shuffle on the customer
    * key, one left join, then the histogram is an O(distinct counts)
    * aggregate.
    */
  val q155OrderCountHistogram = QueryDef(
    "q155_order_count_histogram",
    (s, dir) => {
      import s.implicits._
      val po = t(s, dir, "orders").groupBy($"o_custkey")
        .agg(count(lit(1)).as("_c"))
      t(s, dir, "customer").select($"c_custkey")
        .join(po, $"c_custkey" === $"o_custkey", "left")
        .select(coalesce($"_c", lit(0L)).as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""
      WITH po AS (
        SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1)
      SELECT COALESCE(c, 0) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM customer LEFT JOIN po ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  // ----------------------------------------------------------- q156_promo_revenue
  /** TPC-H Q14 shape: the promo-type revenue share for one month — a
    * conditional-sum ratio in ONE grouped pass (numerator and
    * denominator never fork the join), part dim broadcast, month filter
    * at the lineitem scan. The share divides the two decimal sums as
    * doubles in one fixed tree and rounds to 6.
    */
  val q156PromoRevenue = QueryDef(
    "q156_promo_revenue",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part").select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type" === "PROMO",
            dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))))
            .as("_p"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .as("_t"))
        .select(
          round($"_p".cast("double") / $"_t".cast("double") * 100, 6)
            .as("promo_share"),
          round($"_t".cast("double"), 4).as("total_revenue"))
    },
    Some("""
      SELECT round(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
               CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               * 100, 6) AS promo_share,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
               AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'"""))

  // ------------------------------------------------------------ q157_large_orders
  /** TPC-H Q18 shape: orders whose total quantity exceeds the threshold
    * — the HAVING-on-a-fact-aggregate census. One fact shuffle builds
    * per-order quantity; the qualifying set is FACT-PROPORTIONAL
    * (~0.1% of orders), so it is deliberately NOT hint-broadcast — at
    * sf0.1 AQE converts both attach joins to broadcasts at runtime,
    * while at 100 TB (millions of qualifiers) the same plan degrades
    * gracefully to shuffle joins on the order/customer keys instead of
    * OOMing the driver on a "small" side that grew with the corpus.
    */
  val q157LargeOrders = QueryDef(
    "q157_large_orders",
    (s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem").groupBy($"l_orderkey")
        .agg(sum(dec($"l_quantity")).as("_q"))
        .filter($"_q" > 300)
        .select($"l_orderkey", round($"_q".cast("double"), 4).as("sum_qty"))
      val ord = t(s, dir, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"sum_qty")
      t(s, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"sum_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey,
               round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             sum_qty
      FROM big JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  // -------------------------------------------------------- q158_discount_revenue
  /** TPC-H Q19 shape: the disjunctive brand/size/quantity predicate —
    * three AND-clauses OR'd together, the classic test that a messy
    * boolean filter still collapses into ONE broadcast-join pass with
    * the part predicate evaluated post-join (no per-clause scan, no
    * union of three subqueries).
    */
  val q158DiscountRevenue = QueryDef(
    "q158_discount_revenue",
    (s, dir) => {
      import s.implicits._
      val prt = t(s, dir, "part")
        .select($"p_partkey", $"p_brand", $"p_size")
      t(s, dir, "lineitem")
        .join(broadcast(prt), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#4" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
        .agg(round(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
               AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)"""))

  // ------------------------------------------------------------ q159_idle_wealthy
  /** TPC-H Q22 shape (adapted: the testdata has no `c_phone`, so the
    * country-code cut becomes a nation rollup): customers with an
    * above-average positive balance and NO order in the trailing two
    * years of the dataset — the anti-join + derived-scalar-threshold
    * census. Both scalars (the balance threshold and the recency
    * cutoff) DERIVE from the data as broadcast one-row aggregates (the
    * q139 discipline — a hand-set date dial would silently drift as
    * the dataset grows); the order recency filter is a broadcast-
    * threshold filter followed by an anti-join on the customer key.
    */
  val q159IdleWealthy = QueryDef(
    "q159_idle_wealthy",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val thr = cust.filter($"c_acctbal" > 0)
        .agg((sum(dec($"c_acctbal")).cast("double") / count(lit(1)))
          .as("_thr"))
      // timestamp - INTERVAL (not add_months, which truncates to DATE
      // and would silently diverge from the oracle's interval
      // arithmetic if order timestamps ever carried a time of day)
      val cutoff = t(s, dir, "orders")
        .agg((max($"o_orderdate") - expr("INTERVAL 24 MONTHS")).as("_cut"))
      val recent = t(s, dir, "orders").crossJoin(broadcast(cutoff))
        .filter($"o_orderdate" >= $"_cut")
        .select($"o_custkey")
      cust.crossJoin(broadcast(thr))
        .filter($"c_acctbal" > $"_thr")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .join(broadcast(t(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_custs"),
          round(sum(dec($"c_acctbal")).cast("double"), 4).as("total_bal"))
        .orderBy($"n_name")
    },
    Some("""
      WITH thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*) AS t
        FROM customer WHERE c_acctbal > 0),
      cutoff AS (
        SELECT max(o_orderdate) - INTERVAL 24 MONTH AS cut FROM orders),
      recent AS (
        SELECT DISTINCT o_custkey FROM orders, cutoff
        WHERE o_orderdate >= cut)
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
             round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
               AS total_bal
      FROM customer CROSS JOIN thr
      JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > thr.t
        AND c_custkey NOT IN (SELECT o_custkey FROM recent)
      GROUP BY n_name ORDER BY n_name"""))

  // ---------------------------------------------------------- q160_partition_prune
  /** Partition pruning — the time-axis scan lever every 100 TB event
    * store lives on, demonstrated end to end: the event log is written
    * ONCE as a day-partitioned catalog table
    * ([[graft.operators.ScaleJoins.writePartitioned]] — the layout
    * production lands ingest in, day directories on disk), and the
    * one-week rollup then reads ONLY the seven matching directories —
    * the day predicate resolves at PLANNING time (`PartitionFilters`
    * on the scan, pinned in PlanAuditSpec), zero I/O for the other
    * days, where the raw layout (the oracle's view) scans every row.
    * Like the q84/q93 index probes, the timed query deliberately pays
    * the build; production amortizes it across every query that ever
    * filters on time.
    */
  val q160PartitionPrune = QueryDef(
    "q160_partition_prune",
    (s, dir) => {
      import s.implicits._
      import graft.operators.ScaleJoins
      val tbl = ScaleJoins.writePartitioned(
        t(s, dir, "events").withColumn("day", to_date($"ts")),
        "graft_q160_events_byday", "day")
      s.table(tbl)
        .filter($"day" >= lit("2024-01-08").cast("date") &&
          $"day" < lit("2024-01-15").cast("date"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(dec($"value")).cast("double"), 4).as("value_sum"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
               AS value_sum
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
        AND CAST(ts AS DATE) <  DATE '2024-01-15'
      GROUP BY 1 ORDER BY 1"""))

  def all: Seq[QueryDef] = Seq(q150AudioDecode, q151ShippingPriority,
    q152VolumeShipping, q153ProductProfit, q154ReturnedItems,
    q155OrderCountHistogram, q156PromoRevenue, q157LargeOrders,
    q158DiscountRevenue, q159IdleWealthy, q160PartitionPrune)
}
