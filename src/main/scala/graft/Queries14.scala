package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 query surface, part 8: experimentation and reliability
  * statistics over the event stream — Kaplan–Meier time-to-event,
  * two-proportion A/B z-test, trailing-window anomaly score.
  * Oracle-parity rules as in [[Queries]]/[[Queries2]].
  */
object Queries14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ----------------------------------------------------------- q129_survival_km
  /** Kaplan–Meier signup→purchase curve: for each integer day-offset t
    * with conversions, the survival estimate
    * `S(t) = Π_{t'≤t} (1 − d_t'/n_t')` where users who never purchase
    * are right-censored at the log horizon — the correct time-to-event
    * answer when naive "conversion within N days" misreads censoring
    * as failure. Per-user firsts are partial-agged mins chained on
    * user_id (the q125 shape); the KM table itself is windows over the
    * O(distinct durations) frame — at-risk counts from a lagged
    * cumsum, the product via `exp(Σ ln)` with the ln rounded to 9
    * (q60 transcendental discipline) and the sum folded as exact
    * decimals. Terminal all-convert steps (at_risk = d, S = 0) are
    * excluded by construction to keep `ln` off −∞ in both engines.
    */
  val q129SurvivalKm = QueryDef(
    "q129_survival_km",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val mx = ev.agg(max($"us").as("_mx"))
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"us").as("s_us"))
      val pu = ev.filter($"event_type" === "purchase").join(su, "user_id")
        .filter($"us" >= $"s_us")
        .groupBy($"user_id").agg(min($"us").as("p_us"))
      val durs = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(mx))
        .select(
          expr("coalesce(p_us - s_us, _mx - s_us) div 86400000000")
            .as("dur"),
          when($"p_us".isNotNull, 1L).otherwise(0L).as("e"))
      val g = durs.groupBy($"dur")
        .agg(sum($"e").as("d"), count(lit(1)).as("n_at"))
      val byDur = Window.orderBy($"dur")
      val prevW = byDur.rowsBetween(Window.unboundedPreceding, -1)
      val cumW = byDur.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      g.withColumn("at_risk",
          sum($"n_at").over(Window.partitionBy(lit(0)))
            - coalesce(sum($"n_at").over(prevW), lit(0L)))
        .filter($"d" > 0 && $"at_risk" > $"d")
        .withColumn("_lf",
          round(log(($"at_risk" - $"d").cast("double") / $"at_risk"), 9))
        .withColumn("survival",
          round(exp(sum($"_lf".cast("decimal(27,12)")).over(cumW)
            .cast("double")), 6))
        .select($"dur".as("dur_days"), $"at_risk", $"d".as("n_events"),
          $"survival")
        .orderBy($"dur_days")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      mx AS (SELECT MAX(us) AS mxus FROM ev),
      su AS (SELECT user_id, MIN(us) AS s_us FROM ev
             WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT ev.user_id, MIN(us) AS p_us FROM ev JOIN su USING (user_id)
             WHERE event_type = 'purchase' AND us >= s_us GROUP BY 1),
      durs AS (
        SELECT COALESCE(p_us - s_us, mxus - s_us) // 86400000000 AS dur,
               CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM su LEFT JOIN pu USING (user_id), mx),
      g AS (SELECT dur, SUM(e) AS d, COUNT(*) AS n_at FROM durs GROUP BY 1),
      w AS (
        SELECT dur, d, n_at,
               SUM(n_at) OVER ()
                 - COALESCE(SUM(n_at) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS at_risk
        FROM g),
      e AS (
        SELECT dur, at_risk, d,
               round(ln(CAST(at_risk - d AS DOUBLE) / at_risk), 9) AS lf
        FROM w WHERE d > 0 AND at_risk > d)
      SELECT dur AS dur_days, CAST(at_risk AS BIGINT) AS at_risk,
             CAST(d AS BIGINT) AS n_events,
             round(exp(CAST(SUM(CAST(lf AS DECIMAL(27,12))) OVER (
               ORDER BY dur ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6)
               AS survival
      FROM e ORDER BY dur_days"""))

  // -------------------------------------------------------------- q130_ab_ztest
  /** Two-proportion A/B z-test on view→purchase-within-a-day
    * conversion, variants assigned by user-id parity (the
    * deterministic hash-bucket assignment every experimentation
    * platform uses — q48's shard assignment applied to users): one
    * per-user pass derives (variant, converted), one O(1) aggregate
    * folds both arms, and the z-statistic's pooled-variance algebra
    * runs on the single summary row. The 1-day attribution horizon is
    * what keeps the test non-degenerate on a long log (unbounded
    * horizon converges to p = 1, σ = 0); z is null when the pooled
    * variance is zero, in both engines. Rates round at 9, z at 6;
    * `sqrt` input is exact-count algebra, so cross-engine IEEE
    * agreement follows the established discipline.
    */
  val q130AbZtest = QueryDef(
    "q130_ab_ztest",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      // ONE event-log pass (plan-pinned): first-view time and the
      // purchase-time list fold in the same per-user aggregate, and the
      // attribution test is an array `exists` — per-user purchase lists
      // are bounded by user activity, not corpus size
      val users = ev.groupBy($"user_id").agg(
          min(when($"event_type" === "view", $"us")).as("t1"),
          collect_list(when($"event_type" === "purchase", $"us")).as("ps"))
        .filter($"t1".isNotNull)
        .select(($"user_id" % 2).as("variant"),
          when(exists($"ps",
            p => p >= $"t1" && p < $"t1" + 86400000000L), 1L)
            .otherwise(0L).as("conv"))
      users.agg(
          sum(when($"variant" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"variant" === 0, $"conv").otherwise(0L)).as("conv_a"),
          sum(when($"variant" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"variant" === 1, $"conv").otherwise(0L)).as("conv_b"))
        .select($"n_a", $"conv_a",
          round($"conv_a".cast("double") / $"n_a", 9).as("rate_a"),
          $"n_b", $"conv_b",
          round($"conv_b".cast("double") / $"n_b", 9).as("rate_b"),
          round((($"conv_a" + $"conv_b").cast("double")
            / ($"n_a" + $"n_b")), 9).as("_p"))
        .withColumn("_se", sqrt($"_p" * (lit(1.0) - $"_p")
          * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
        .select($"n_a", $"conv_a", $"rate_a", $"n_b", $"conv_b", $"rate_b",
          when($"_se" > 0,
            round(($"rate_a" - $"rate_b") / $"_se", 6)).as("z"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      u0 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN us END) AS t1,
               list(us) FILTER (WHERE event_type = 'purchase') AS ps
        FROM ev GROUP BY 1),
      users AS (
        SELECT user_id % 2 AS variant,
               CASE WHEN len(list_filter(COALESCE(ps, []),
                      p -> p >= t1 AND p < t1 + 86400000000)) > 0
                 THEN 1 ELSE 0 END AS conv
        FROM u0 WHERE t1 IS NOT NULL),
      agg AS (
        SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS conv_a,
               SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
               SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS conv_b
        FROM users),
      r AS (
        SELECT *, round(CAST(conv_a AS DOUBLE) / n_a, 9) AS rate_a,
               round(CAST(conv_b AS DOUBLE) / n_b, 9) AS rate_b,
               round(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b), 9) AS p
        FROM agg),
      se AS (
        SELECT *, sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)) AS sev
        FROM r)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
             rate_a,
             CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
             rate_b,
             CASE WHEN sev > 0 THEN round((rate_a - rate_b) / sev, 6) END AS z
      FROM se"""))

  // ------------------------------------------------------------ q131_error_spike
  /** Trailing-window anomaly score for the error rate: each day's rate
    * against the mean/σ of the PRIOR 7 observed days (rows, not
    * calendar range — gaps compress, which is what an on-call wants
    * when the pipeline skipped a day). One partial-agged count pass;
    * everything after runs on the O(days) frame: trailing sums as
    * exact decimals, variance via the moment identity with a
    * `greatest(…, 0)` clamp so round-9 jitter can't drive `sqrt`
    * negative (clamped identically in the oracle). z is null until a
    * full 7-day history exists or when σ = 0.
    */
  val q131ErrorSpike = QueryDef(
    "q131_error_spike",
    (s, dir) => {
      import s.implicits._
      val g = t(s, dir, "events")
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          when($"event_type" === "error", 1L).otherwise(0L).as("e"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_total"), sum($"e").as("n_err"))
        .withColumn("rate",
          round($"n_err".cast("double") / $"n_total", 9))
      val trail = Window.orderBy($"day").rowsBetween(-7, -1)
      g.withColumn("_cnt", count(lit(1)).over(trail))
        .withColumn("_mean",
          round(sum($"rate".cast("decimal(27,12)")).over(trail)
            .cast("double") / 7, 9))
        .withColumn("_m2",
          round(sum(round($"rate" * $"rate", 9).cast("decimal(27,12)"))
            .over(trail).cast("double") / 7, 9))
        .withColumn("_sd",
          round(sqrt(greatest($"_m2" - $"_mean" * $"_mean", lit(0.0))), 9))
        .select($"day", $"n_total", $"n_err", $"rate",
          when($"_cnt" === 7 && $"_sd" > 0,
            round(($"rate" - $"_mean") / $"_sd", 6)).as("z"))
        .orderBy($"day")
    },
    Some("""
      WITH g AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
               COUNT(*) AS n_total,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
        FROM events GROUP BY 1),
      r AS (
        SELECT day, n_total, n_err,
               round(CAST(n_err AS DOUBLE) / n_total, 9) AS rate
        FROM g),
      w AS (
        SELECT *,
               COUNT(*) OVER tw AS cnt,
               round(CAST(SUM(CAST(rate AS DECIMAL(27,12))) OVER tw
                 AS DOUBLE) / 7, 9) AS mean,
               round(CAST(SUM(CAST(round(rate * rate, 9) AS DECIMAL(27,12)))
                 OVER tw AS DOUBLE) / 7, 9) AS m2
        FROM r
        WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      sd AS (
        SELECT *, round(sqrt(GREATEST(m2 - mean * mean, 0.0)), 9) AS sdev
        FROM w)
      SELECT day, CAST(n_total AS BIGINT) AS n_total,
             CAST(n_err AS BIGINT) AS n_err, rate,
             CASE WHEN cnt = 7 AND sdev > 0
               THEN round((rate - mean) / sdev, 6) END AS z
      FROM sd ORDER BY day"""))

  def all: Seq[QueryDef] = Seq(q129SurvivalKm, q130AbZtest, q131ErrorSpike)
}
