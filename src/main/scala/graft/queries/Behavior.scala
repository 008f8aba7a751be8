package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Behavioral event analytics over `events` — the funnel/cohort
  * queries every event warehouse runs next to the time-series surface
  * (the reference's visit tables answer the same "which objects
  * progressed through which observation stages" shape).
  *
  * Scale shape: both queries shuffle ONCE on `user_id` (cardinality
  * grows with the data) and everything after runs inside that
  * partitioning — the stacked stage windows reuse one Exchange+Sort,
  * and the per-user aggregate that follows is co-partitioned, so no
  * second data-sized shuffle exists. All time arithmetic is exact
  * integer micros.
  */
object Behavior {

  /** Micros per day, in integer space. */
  private val DayUs = 86400000000L
  /** Retention horizon (days after cohort entry) reported. */
  val RetentionDays = 7

  /** events with integer-micro timestamps. NULL user_id (anonymous)
    * rows are excluded up front: a NULL key would otherwise collapse
    * every anonymous event into ONE phantom user — inflating funnel
    * counts with mixed unrelated sessions, seeding a fake cohort, and
    * concentrating all those rows in a single window partition (the
    * exact skew the single-shuffle design avoids). Mirrored in both
    * oracles. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_type", expr("ts DIV 1000").as("tus"))
  }

  // ---------------------------------------------------------------
  /** Ordered conversion funnel view → click → purchase: a user is at
    * stage n when stage n's event happened strictly AFTER their stage
    * n−1 time (first-touch semantics: t1 = first view, t2 = first
    * click after t1, t3 = first purchase after t2).
    *
    * Single-shuffle plan: the three stage times are stacked window
    * minima over the SAME user partition — each window may reference
    * the previous stage's column, and Catalyst plans all three Window
    * operators over one Exchange+Sort. The per-user rollup that
    * follows is co-partitioned (no second shuffle); the final
    * one-row aggregate is map-side combined. */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    val staged = ev(s, dir)
      .withColumn("t1",
        min(when($"event_type" === "view", $"tus")).over(w))
      .withColumn("t2",
        min(when($"event_type" === "click" && $"tus" > $"t1", $"tus")).over(w))
      .withColumn("t3",
        min(when($"event_type" === "purchase" && $"tus" > $"t2", $"tus")).over(w))
    staged
      .groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"t3").as("t3"))
      .agg(
        count(lit(1)).as("n_users"),
        count($"t1").as("n_view"),
        count($"t2").as("n_view_click"),
        count($"t3").as("n_full_funnel"),
        sum($"t2" - $"t1").as("sum_view_to_click_us"),
        sum($"t3" - $"t2").as("sum_click_to_buy_us"))
  }

  val qFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
      |            WHERE user_id IS NOT NULL),
      |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
      |         OVER (PARTITION BY user_id) AS t1 FROM ev),
      |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t1 THEN tus END)
      |         OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t2 THEN tus END)
      |         OVER (PARTITION BY user_id) AS t3 FROM w2),
      |u AS (SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
      |      FROM w3 GROUP BY 1)
      |SELECT COUNT(*) AS n_users,
      |  COUNT(t1) AS n_view, COUNT(t2) AS n_view_click, COUNT(t3) AS n_full_funnel,
      |  CAST(SUM(t2 - t1) AS BIGINT) AS sum_view_to_click_us,
      |  CAST(SUM(t3 - t2) AS BIGINT) AS sum_click_to_buy_us
      |FROM u""".stripMargin

  // ---------------------------------------------------------------
  /** Cohort retention: users are grouped by their first active day
    * (the cohort); for each day offset 0..[[RetentionDays]] the query
    * counts how many of the cohort's users were active again. The
    * (user, day) pairs are deduplicated first, so `COUNT(*)` per
    * (cohort, offset) IS the distinct-user count — no expensive
    * count-distinct at the end.
    *
    * Shuffles: one for the (user, day) dedup, one to bring each
    * user's days together for the cohort window (both keys scale with
    * the data), and the tiny (cohort, offset) rollup. */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    ev(s, dir)
      .select($"user_id", expr(s"tus DIV $DayUs").as("day"))
      .distinct()
      .withColumn("cohort_day", min($"day").over(w))
      .withColumn("day_offset", $"day" - $"cohort_day")
      .filter($"day_offset" <= RetentionDays)
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val qRetentionSql: String =
    s"""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events
       |            WHERE user_id IS NOT NULL),
       |c AS (SELECT *, MIN(day) OVER (PARTITION BY user_id) AS cohort_day FROM ud)
       |SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_users
       |FROM c WHERE day - cohort_day <= $RetentionDays
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** Audience overlap: for every pair of event types, how many users
    * do both, with exact integer parts-per-million Jaccard. The
    * distinct (type, user) projection collapses event volume to
    * audiences BEFORE the self-join, and the join key is user_id
    * (data-scale cardinality, shuffle-balanced); per-type totals ride
    * in as a broadcast. The `t1 < t2` canonicalization halves the
    * pair space. Jaccard in integer DIV space so both engines agree
    * bit-for-bit. */
  def qAudienceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the audience table feeds three subplans (totals + both join
    // sides); Catalyst plans each independently, so without this
    // materialization the events scan + distinct would run 3×.
    // localCheckpoint pins the (users × types)-bounded table once.
    val aud = ev(s, dir).select($"event_type", $"user_id").distinct()
      .localCheckpoint()
    val totals = aud.groupBy($"event_type").agg(count(lit(1)).as("sz"))
    val shared = aud.select($"event_type".as("t1"), $"user_id")
      .join(aud.select($"event_type".as("t2"), $"user_id"), Seq("user_id"))
      .filter($"t1" < $"t2")
      .groupBy($"t1", $"t2")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(totals.select($"event_type".as("t1"), $"sz".as("n_a"))), Seq("t1"))
      .join(broadcast(totals.select($"event_type".as("t2"), $"sz".as("n_b"))), Seq("t2"))
      .withColumn("jacc_ppm",
        expr("n_shared * 1000000 DIV (n_a + n_b - n_shared)"))
      .select($"t1", $"t2", $"n_shared", $"n_a", $"n_b", $"jacc_ppm")
      .orderBy($"t1", $"t2")
  }

  val qAudienceOverlapSql: String =
    """WITH aud AS (SELECT DISTINCT event_type, user_id FROM events
      |             WHERE user_id IS NOT NULL),
      |tot AS (SELECT event_type, COUNT(*) AS sz FROM aud GROUP BY 1),
      |sh AS (SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_shared
      |       FROM aud a JOIN aud b ON a.user_id = b.user_id
      |         AND a.event_type < b.event_type
      |       GROUP BY 1, 2)
      |SELECT t1, t2, n_shared,
      |  ta.sz AS n_a, tb.sz AS n_b,
      |  n_shared * 1000000 // (ta.sz + tb.sz - n_shared) AS jacc_ppm
      |FROM sh JOIN tot ta ON sh.t1 = ta.event_type
      |        JOIN tot tb ON sh.t2 = tb.event_type
      |ORDER BY t1, t2""".stripMargin

  // ---------------------------------------------------------------
  /** Contiguous sequence-pattern match: users whose time-ordered
    * stream contains view → click → purchase as IMMEDIATELY
    * consecutive events (the strict MATCH_RECOGNIZE shape, vs
    * [[qFunnel]]'s eventually-ordered stages), with the number of
    * occurrences. Two lags over the one user-partitioned window sort
    * detect every triple in a single pass — no per-user sequence
    * string is ever materialized, so the state per row is two event
    * types regardless of stream length. */
  def qSequenceMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_id", expr("ts DIV 1000").as("tus"),
        $"event_type")
      .withColumn("t1", lag($"event_type", 2).over(w))
      .withColumn("t2", lag($"event_type", 1).over(w))
      .filter($"t1" === "view" && $"t2" === "click" &&
        $"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_matches"))
      .orderBy($"user_id")
  }

  val qSequenceMatchSql: String =
    """SELECT user_id, COUNT(*) AS n_matches
      |FROM (SELECT user_id, event_type,
      |        LAG(event_type, 2) OVER pw AS t1,
      |        LAG(event_type, 1) OVER pw AS t2
      |      FROM events WHERE user_id IS NOT NULL
      |      WINDOW pw AS (PARTITION BY user_id
      |        ORDER BY epoch_us(ts), event_id))
      |WHERE t1 = 'view' AND t2 = 'click' AND event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  /** RFM segmentation: per user, recency (days since last purchase at
    * the corpus horizon), frequency (purchase count) and monetary
    * (exact cent sum), each cut at FIXED domain thresholds into
    * 1–3 scores concatenated to a segment code. One combinable
    * shuffle on user_id; the horizon rides in as a broadcast scalar.
    * Fixed thresholds (not per-corpus quantiles) keep a user's
    * segment stable as the corpus grows — the production choice, and
    * exact-integer parity for free. */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir)
      .filter($"user_id".isNotNull && $"event_type" === "purchase")
      .select($"user_id", expr("ts DIV 1000").as("tus"),
        round($"value" * 100).cast("long").as("vc"))
    val horizon = p.agg(max($"tus").as("h"))
    p.groupBy($"user_id")
      .agg(max($"tus").as("last_tus"),
        count(lit(1)).as("freq"),
        sum($"vc").as("mon_c100"))
      .crossJoin(broadcast(horizon))
      .withColumn("rec_days", expr(s"(h - last_tus) DIV $DayUs"))
      .withColumn("r_score",
        when($"rec_days" <= 3, 3).when($"rec_days" <= 10, 2).otherwise(1))
      .withColumn("f_score",
        when($"freq" >= 20, 3).when($"freq" >= 8, 2).otherwise(1))
      .withColumn("m_score",
        when($"mon_c100" >= 80000, 3).when($"mon_c100" >= 45000, 2).otherwise(1))
      .withColumn("segment",
        concat($"r_score".cast("string"), $"f_score".cast("string"),
          $"m_score".cast("string")))
      .select($"user_id", $"rec_days", $"freq", $"mon_c100",
        $"r_score", $"f_score", $"m_score", $"segment")
      .orderBy($"user_id")
  }

  val qRfmSql: String =
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS tus,
       |             CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
       |           WHERE user_id IS NOT NULL AND event_type = 'purchase'),
       |h AS (SELECT MAX(tus) AS h FROM p),
       |u AS (SELECT user_id, MAX(tus) AS last_tus, COUNT(*) AS freq,
       |        CAST(SUM(vc) AS BIGINT) AS mon_c100
       |      FROM p GROUP BY 1),
       |sc AS (SELECT user_id, (h - last_tus) // $DayUs AS rec_days, freq, mon_c100,
       |         CASE WHEN (h - last_tus) // $DayUs <= 3 THEN 3
       |              WHEN (h - last_tus) // $DayUs <= 10 THEN 2 ELSE 1 END AS r_score,
       |         CASE WHEN freq >= 20 THEN 3 WHEN freq >= 8 THEN 2 ELSE 1 END AS f_score,
       |         CASE WHEN mon_c100 >= 80000 THEN 3
       |              WHEN mon_c100 >= 45000 THEN 2 ELSE 1 END AS m_score
       |       FROM u CROSS JOIN h)
       |SELECT user_id, rec_days, freq, mon_c100, r_score, f_score, m_score,
       |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
       |    || CAST(m_score AS VARCHAR) AS segment
       |FROM sc ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  /** Cohort lifetime value: per first-seen-day cohort, users and the
    * exact cent sum of purchase value within the first
    * [[RetentionDays]] days of each user's life — retention's revenue
    * twin. The cohort day attaches via one user-partitioned window
    * min (same single shuffle as retention); the horizon filter and
    * the rollup are combinable. */
  def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_type", expr("ts DIV 1000").as("tus"),
        round($"value" * 100).cast("long").as("vc"))
      .withColumn("first_tus", min($"tus").over(w))
      .filter($"event_type" === "purchase" &&
        $"tus" - $"first_tus" <= lit(RetentionDays) * DayUs)
      .groupBy(expr(s"first_tus DIV $DayUs").as("cohort_day"))
      .agg(count_distinct($"user_id").as("n_buyers"),
        count(lit(1)).as("n_purchases"),
        sum($"vc").as("ltv_c100"))
      .orderBy($"cohort_day")
  }

  val qCohortLtvSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
       |    CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
       |  WHERE user_id IS NOT NULL),
       |f AS (SELECT *, MIN(tus) OVER (PARTITION BY user_id) AS first_tus FROM ev)
       |SELECT first_tus // $DayUs AS cohort_day,
       |  COUNT(DISTINCT user_id) AS n_buyers,
       |  COUNT(*) AS n_purchases,
       |  CAST(SUM(vc) AS BIGINT) AS ltv_c100
       |FROM f
       |WHERE event_type = 'purchase' AND tus - first_tus <= $RetentionDays * $DayUs
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** Time-to-convert DISTRIBUTION per funnel leg — the product
    * question after [[qFunnel]]'s counts ("how many convert" →
    * "how LONG do they take"): per leg (view→click, click→buy), the
    * converting users' exact p50/p90/max latency in microseconds.
    * Sums (which q_funnel already carries) hide the shape — a p90
    * collapse with a stable median is the classic slow-cohort
    * regression this view exists to catch.
    *
    * Percentiles are EXACT discrete ranks (PERCENTILE_DISC
    * semantics) computed the q_percentile_disc way: the per-leg
    * duration frame rides [[graft.operators.RankSplit]] (cell-bounded
    * sorts — never a one-task per-leg sort), the rank
    * ⌈q·n⌉ row IS the percentile, and ties are rank-invariant
    * because the VALUE at a rank is what's reported. All integer.
    *
    * Scale shape: the funnel staging is [[qFunnel]]'s user-key
    * window pass; everything after runs on the ≤2·|converting
    * users| duration frame through RankSplit's combinable stages. */
  def qFunnelTime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    val staged = ev(s, dir)
      .withColumn("t1",
        min(when($"event_type" === "view", $"tus")).over(w))
      .withColumn("t2",
        min(when($"event_type" === "click" && $"tus" > $"t1", $"tus")).over(w))
      .withColumn("t3",
        min(when($"event_type" === "purchase" && $"tus" > $"t2", $"tus")).over(w))
      .groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"t3").as("t3"))
    // pinned: RankSplit traverses its input in THREE independent
    // subplans (documented cost contract) — unpinned, the whole
    // funnel staging (events scan + user window + aggregate) would
    // re-run per subplan; the legs frame is converters-sized
    val legs = staged.filter($"t2".isNotNull)
      .select($"user_id", lit("view_click").as("leg"),
        ($"t2" - $"t1").as("d"))
      .unionByName(staged.filter($"t3".isNotNull)
        .select($"user_id", lit("click_buy").as("leg"),
          ($"t3" - $"t2").as("d")))
      .localCheckpoint()
    graft.operators.RankSplit.rank(legs, Seq("leg"), "d",
      Seq("d", "user_id"))
      .filter($"__rank" === expr("CAST(CEIL(0.5 * __grp_n) AS BIGINT)") ||
        $"__rank" === expr("CAST(CEIL(0.9 * __grp_n) AS BIGINT)") ||
        $"__rank" === $"__grp_n")
      .groupBy($"leg")
      .agg(max($"__grp_n").as("n_conv"),
        min(when($"__rank" === expr("CAST(CEIL(0.5 * __grp_n) AS BIGINT)"),
          $"d")).as("p50_us"),
        min(when($"__rank" === expr("CAST(CEIL(0.9 * __grp_n) AS BIGINT)"),
          $"d")).as("p90_us"),
        min(when($"__rank" === $"__grp_n", $"d")).as("max_us"))
      .orderBy($"leg")
  }

  /** Oracle twin: the funnel CTEs + PERCENTILE_DISC per leg. */
  val qFunnelTimeSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
      |            WHERE user_id IS NOT NULL),
      |w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
      |         OVER (PARTITION BY user_id) AS t1 FROM ev),
      |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t1 THEN tus END)
      |         OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t2 THEN tus END)
      |         OVER (PARTITION BY user_id) AS t3 FROM w2),
      |u AS (SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
      |      FROM w3 GROUP BY 1),
      |legs AS (SELECT user_id, 'view_click' AS leg, t2 - t1 AS d FROM u
      |           WHERE t2 IS NOT NULL
      |         UNION ALL
      |         SELECT user_id, 'click_buy', t3 - t2 FROM u
      |           WHERE t3 IS NOT NULL)
      |SELECT leg, COUNT(*) AS n_conv,
      |  CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT) AS p50_us,
      |  CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY d) AS BIGINT) AS p90_us,
      |  CAST(MAX(d) AS BIGINT) AS max_us
      |FROM legs GROUP BY 1 ORDER BY leg""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel_time" -> (qFunnelTime _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_audience_overlap" -> (qAudienceOverlap _),
    "q_sequence_match" -> (qSequenceMatch _),
    "q_rfm" -> (qRfm _),
    "q_cohort_ltv" -> (qCohortLtv _))

  val oracles: Map[String, String] = Map(
    "q_funnel_time" -> qFunnelTimeSql,
    "q_funnel" -> qFunnelSql,
    "q_retention" -> qRetentionSql,
    "q_audience_overlap" -> qAudienceOverlapSql,
    "q_sequence_match" -> qSequenceMatchSql,
    "q_rfm" -> qRfmSql,
    "q_cohort_ltv" -> qCohortLtvSql)
}
