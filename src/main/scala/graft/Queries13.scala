package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 query surface, part 7: product-analytics operators over the
  * event stream (funnel, retention cohorts, journey transitions) and
  * model-quality observability (probe calibration). Oracle-parity rules
  * as in [[Queries]]/[[Queries2]].
  */
object Queries13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------- q125_event_funnel
  /** Ordered conversion funnel view → click → purchase: a user counts
    * at each step only if the step's FIRST occurrence follows their
    * first occurrence of the previous step — the sequencing constraint
    * that separates a funnel from three independent counts. Each step
    * is a per-user partial-agged min over a pushed-down type filter,
    * chained by equi-joins on user_id (user-table-sized frames, never
    * the event log twice in one join); step-over-step conversion folds
    * via lag over the O(steps) summary frame.
    */
  val q125EventFunnel = QueryDef(
    "q125_event_funnel",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"us").as("t1"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"us" >= $"t1")
        .groupBy($"user_id").agg(min($"us").as("t2"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"us" >= $"t2")
        .groupBy($"user_id").agg(min($"us").as("t3"))
      val steps = v.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("step_ord"), lit("view").as("step"), $"n_users")
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("step_ord"), lit("click").as("step"), $"n_users"))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("step_ord"), lit("purchase").as("step"),
            $"n_users"))
      val ord = Window.partitionBy(lit(0)).orderBy($"step_ord")
      steps
        .withColumn("conv_from_prev",
          round($"n_users".cast("double")
            / coalesce(lag($"n_users", 1).over(ord), $"n_users"), 6))
        .select($"step_ord".cast("long").as("step_ord"), $"step",
          $"n_users", $"conv_from_prev")
        .orderBy($"step_ord")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      v AS (SELECT user_id, MIN(us) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev JOIN v USING (user_id)
            WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
      p AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1),
      steps AS (
        SELECT 1 AS step_ord, 'view' AS step, COUNT(*) AS n_users FROM v
        UNION ALL
        SELECT 2, 'click', COUNT(*) FROM c
        UNION ALL
        SELECT 3, 'purchase', COUNT(*) FROM p)
      SELECT CAST(step_ord AS BIGINT) AS step_ord, step,
             CAST(n_users AS BIGINT) AS n_users,
             round(CAST(n_users AS DOUBLE)
               / COALESCE(LAG(n_users) OVER (ORDER BY step_ord), n_users), 6)
               AS conv_from_prev
      FROM steps ORDER BY step_ord"""))

  // ------------------------------------------------------ q126_retention_cohorts
  /** Weekly retention cohorts: users grouped by first-active week, the
    * classic triangle of "what fraction of week-w0 users were active
    * again w weeks later". Integer-µs day/week arithmetic (the q115
    * contract, no timezone or calendar functions), one distinct
    * (user, week) pass + a per-user min — cohort sizes attach via a
    * window over the O(weeks²) matrix, never a second event scan.
    */
  val q126RetentionCohorts = QueryDef(
    "q126_retention_cohorts",
    (s, dir) => {
      import s.implicits._
      val wk = t(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000 div 7").as("week"))
      val fe = wk.groupBy($"user_id").agg(min($"week").as("w0"))
      val m = wk.distinct().join(fe, "user_id")
        .select($"w0", ($"week" - $"w0").as("week_offset"))
        .groupBy($"w0", $"week_offset").agg(count(lit(1)).as("n_active"))
      m.withColumn("cohort_size",
          max(when($"week_offset" === 0, $"n_active"))
            .over(Window.partitionBy($"w0")))
        .select($"w0".as("cohort_week"), $"week_offset", $"n_active",
          round($"n_active".cast("double") / $"cohort_size", 6)
            .as("retention"))
        .orderBy($"cohort_week", $"week_offset")
    },
    Some("""
      WITH wk AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7 AS week
        FROM events),
      fe AS (SELECT user_id, MIN(week) AS w0 FROM wk GROUP BY 1),
      act AS (SELECT DISTINCT user_id, week FROM wk),
      m AS (
        SELECT w0, week - w0 AS week_offset, COUNT(*) AS n_active
        FROM act JOIN fe USING (user_id)
        GROUP BY 1, 2)
      SELECT w0 AS cohort_week, week_offset,
             CAST(n_active AS BIGINT) AS n_active,
             round(CAST(n_active AS DOUBLE)
               / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                   OVER (PARTITION BY w0), 6) AS retention
      FROM m ORDER BY cohort_week, week_offset"""))

  // ------------------------------------------------------ q127_probe_calibration
  /** Reliability diagram for the q87 quality probe: score-decile
    * buckets vs the empirical positive rate among weak-labeled docs —
    * the audit that says whether "score ≥ 0.5" MEANS 50% src0-like, or
    * whether the probe needs recalibration before its threshold gates
    * a corpus (the q118 calibration pattern applied to a trained
    * model). Training reuses the q87/q92 shared chain (one GD probe,
    * O(dims) driver state); scoring and bucketing are one map pass;
    * the diagram is an O(10)-row aggregate.
    */
  val q127ProbeCalibration = {
    import Queries6.ProbeSql.{ctes, scoreSql, Iters}
    QueryDef(
      "q127_probe_calibration",
      (s, dir) => {
        import s.implicits._
        val scored = Queries6.probeScored(s, dir)
        val src = t(s, dir, "documents").select($"doc_id", $"source")
        scored.join(src, "doc_id")
          .select($"score", $"source",
            greatest(lit(0), least(lit(9), floor($"score" * 10).cast("int")))
              .cast("long").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(sum($"score".cast("decimal(27,12)")).cast("double")
              / count(lit(1)), 6).as("mean_score"),
            sum(when($"source".isin("src0", "src1"), 1L).otherwise(0L))
              .as("n_labeled"),
            sum(when($"source" === "src0", 1L).otherwise(0L)).as("_pos"))
          .select($"bucket", $"n_docs", $"mean_score", $"n_labeled",
            when($"n_labeled" > 0,
              round($"_pos".cast("double") / $"n_labeled", 6)).as("pos_rate"))
          .orderBy($"bucket")
      },
      Some(s"""
        WITH $ctes,
        sc AS (SELECT doc_id, source, $scoreSql AS score FROM f, w$Iters),
        bk AS (
          SELECT score, source,
                 CAST(GREATEST(0, LEAST(9, CAST(floor(score * 10) AS INT)))
                   AS BIGINT) AS bucket
          FROM sc)
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               round(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
                 / count(*), 6) AS mean_score,
               CAST(SUM(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_labeled,
               CASE WHEN SUM(CASE WHEN source IN ('src0', 'src1')
                      THEN 1 ELSE 0 END) > 0
                 THEN round(CAST(SUM(CASE WHEN source = 'src0'
                        THEN 1 ELSE 0 END) AS DOUBLE)
                      / SUM(CASE WHEN source IN ('src0', 'src1')
                          THEN 1 ELSE 0 END), 6)
                 END AS pos_rate
        FROM bk GROUP BY bucket ORDER BY bucket"""))
  }

  // ------------------------------------------------------ q128_event_transitions
  /** User-journey Markov transitions: `P(next event | current event)`
    * from each user's time-ordered stream — the one-pass structure
    * behind journey mining, anomaly detection ("error after purchase
    * tripled"), and simulation. One lead() window per user (the event
    * log's natural partitioning), then a (from, to) partial-agg count;
    * row probabilities normalize via a window over the O(types²)
    * matrix. Total order inside a user is (ts, event_id) so
    * simultaneous events can't flip pairs between engines.
    */
  val q128EventTransitions = QueryDef(
    "q128_event_transitions",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round($"n".cast("double")
          / sum($"n").over(Window.partitionBy($"from_type")), 6))
        .orderBy($"from_type", $"to_type")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      tr AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS to_type
        FROM ev),
      m AS (
        SELECT from_type, to_type, COUNT(*) AS n FROM tr
        WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
             round(CAST(n AS DOUBLE)
               / SUM(n) OVER (PARTITION BY from_type), 6) AS p
      FROM m ORDER BY from_type, to_type"""))

  def all: Seq[QueryDef] = Seq(q125EventFunnel, q126RetentionCohorts,
    q127ProbeCalibration, q128EventTransitions)
}
