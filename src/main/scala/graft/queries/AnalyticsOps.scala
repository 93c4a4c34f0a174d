package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort / windowed / robust-statistics analytics over the `events`
  * stream table — the product-analytics shapes a stream consumer runs
  * against the batch tier.
  *
  * Oracle-parity conventions: calendar arithmetic is integer days since
  * epoch (no engine-specific week truncation), money is exact integer
  * cents (`value` carries 2 decimals), and the anomaly statistics are
  * exact HISTOGRAM medians — grouped counts + one cumulative window over
  * the histogram, never a sort of the raw rows — so every derived value
  * is integer math plus at most one final double division.
  *
  * Scale notes: every operator is keyed aggregations; the only windows
  * run over per-type HISTOGRAMS (cardinality = distinct cents values,
  * not rows). The week/median lookup sides are a handful of rows and
  * broadcast. The sliding window explodes each event into exactly
  * width/slide = 4 rows — a bounded fan-out, shuffled once on
  * (window, type).
  */
object AnalyticsOps {

  /** Integer days since 1970-01-01 for the event timestamp. */
  private def ddayCol = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))

  // -------------------------------------------------- retention cohorts

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; `n_users` = how many of each cohort were active again k
    * weeks later. Two keyed aggregations + one equi-join on user_id.
    */
  private def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", ddayCol.cast("long").as("dday"))
    val first = e.groupBy($"user_id").agg(min($"dday").as("d0"))
    e.join(first, Seq("user_id"))
      .select($"user_id", expr("d0 DIV 7").as("cohort_week"),
        expr("(dday - d0) DIV 7").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  private val retentionCohortsSql =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dday
      |  FROM events),
      |f AS (SELECT user_id, MIN(dday) AS d0 FROM e GROUP BY user_id)
      |SELECT CAST(d0 // 7 AS BIGINT) AS cohort_week,
      |  CAST((dday - d0) // 7 AS BIGINT) AS week_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------- sliding windows

  /** Sliding-window event counts / revenue: 1-hour windows advancing
    * every 15 minutes, per event type — Spark's native `window()`
    * (each event lands in exactly 4 windows). The oracle replays the
    * slide-aligned window starts with integer microsecond arithmetic.
    */
  private def slidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("sum_cents"))
      .select(expr("unix_micros(CAST(window.start AS TIMESTAMP))").as("ws"),
        $"event_type", $"n_events", $"sum_cents")
      .orderBy($"ws", $"event_type")
  }

  private val slidingWindowSql =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |w AS (
      |  SELECT event_type, cents,
      |    ((tus // 900000000) - k) * 900000000 AS ws
      |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) ks)
      |SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  // -------------------------------------------------------- stickiness

  /** DAU / WAU stickiness per day: distinct daily actives over distinct
    * weekly actives of the containing week. Two keyed distinct
    * aggregations; the week side (a few rows) broadcasts.
    */
  private def dauStickiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", ddayCol.cast("long").as("dday"))
    val dau = e.groupBy($"dday").agg(countDistinct($"user_id").as("dau"))
    val wau = e.groupBy(expr("dday DIV 7").as("dweek"))
      .agg(countDistinct($"user_id").as("wau"))
    dau.withColumn("dweek", expr("dday DIV 7"))
      .join(broadcast(wau), Seq("dweek"))
      .select($"dday", $"dau", $"wau",
        ($"dau".cast("double") / $"wau".cast("double")).as("stickiness"))
      .orderBy($"dday")
  }

  private val dauStickinessSql =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dday
      |  FROM events),
      |dau AS (SELECT dday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      |        FROM e GROUP BY dday),
      |wau AS (SELECT dday // 7 AS dweek, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      |        FROM e GROUP BY 1)
      |SELECT dday, dau, wau,
      |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      |FROM dau JOIN wau ON dau.dday // 7 = wau.dweek
      |ORDER BY dday""".stripMargin

  // ------------------------------------------------------- MAD anomaly

  /** Robust anomaly counts per event type: exact lower median and MAD
    * (median absolute deviation) of `value` in integer cents, and how
    * many events sit beyond the 3-sigma-equivalent fence
    * `dev > 3 * 1.4826 * mad` (integer-compared as
    * `dev * 10000 > mad * 44478`).
    *
    * The medians are HISTOGRAM medians: group to (type, cents) counts,
    * one cumulative-sum window over the histogram, pick the first bin
    * whose running count reaches (n+1) DIV 2. The shuffle and window
    * carry histogram width, not row count — the scale path for exact
    * order statistics (approx_percentile remains the one-pass
    * alternative when the value domain is unbounded).
    */
  private def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))

    // lower median from a prebuilt (event_type, <value>, cnt) histogram —
    // the histogram is built ONCE per round and shared (Catalyst reuses
    // the identical exchange subplans within the query)
    def medianOfHist(hist: DataFrame, valueCol: String): DataFrame = {
      val n = hist.groupBy($"event_type").agg(sum($"cnt").as("n"))
      val wcum = Window.partitionBy($"event_type").orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("cum", sum($"cnt").over(wcum))
        .join(broadcast(n), Seq("event_type"))
        .filter($"cum" >= expr("(n + 1) DIV 2"))
        .groupBy($"event_type").agg(min(col(valueCol)).as("med"), first($"n").as("n"))
    }

    val hist = ev.groupBy($"event_type", $"cents").agg(count(lit(1)).as("cnt"))
    val med = medianOfHist(hist, "cents")
      .select($"event_type", $"med".as("med_cents"), $"n")
    // deviation histogram folds the VALUE histogram (carries cnt), not
    // the raw rows — the second median round never rescans events
    val devHist = hist
      .join(broadcast(med.select($"event_type", $"med_cents")), Seq("event_type"))
      .groupBy($"event_type", abs($"cents" - $"med_cents").as("dev"))
      .agg(sum($"cnt").as("cnt"))
    val mad = medianOfHist(devHist, "dev")
      .select($"event_type", $"med".as("mad_cents"))
    val outliers = devHist.join(broadcast(mad), Seq("event_type"))
      .groupBy($"event_type")
      .agg(sum(when($"dev" * 10000L > $"mad_cents" * 44478L, $"cnt")
        .otherwise(lit(0L))).as("n_outliers"))
    med.join(mad, Seq("event_type")).join(outliers, Seq("event_type"))
      .select($"event_type", $"n", $"med_cents", $"mad_cents", $"n_outliers")
      .orderBy($"event_type")
  }

  private val anomalyMadSql =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |hist AS (SELECT event_type, cents, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
      |n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
      |cum AS (
      |  SELECT event_type, cents,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM hist),
      |med AS (
      |  SELECT cum.event_type, MIN(cents) AS med_cents
      |  FROM cum JOIN n ON cum.event_type = n.event_type
      |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |dev AS (
      |  SELECT ev.event_type, abs(cents - med_cents) AS dev
      |  FROM ev JOIN med ON ev.event_type = med.event_type),
      |dhist AS (SELECT event_type, dev, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
      |dcum AS (
      |  SELECT event_type, dev,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM dhist),
      |mad AS (
      |  SELECT dcum.event_type, MIN(dev) AS mad_cents
      |  FROM dcum JOIN n ON dcum.event_type = n.event_type
      |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |outl AS (
      |  SELECT dhist.event_type,
      |    CAST(SUM(CASE WHEN dev * 10000 > mad_cents * 44478 THEN cnt ELSE 0 END) AS BIGINT) AS n_outliers
      |  FROM dhist JOIN mad ON dhist.event_type = mad.event_type
      |  GROUP BY 1)
      |SELECT n.event_type AS event_type, n, med_cents, mad_cents, n_outliers
      |FROM n JOIN med ON n.event_type = med.event_type
      |  JOIN mad ON n.event_type = mad.event_type
      |  JOIN outl ON n.event_type = outl.event_type
      |ORDER BY 1""".stripMargin

  // ------------------------------------------------ native session window

  /** Per-user sessions via Spark's NATIVE `session_window` (30-minute
    * gap) — the declarative dual of `ev_sessionize`'s manual lag+cumsum
    * islands. The oracle recomputes the same sessions with the islands
    * technique: a new session starts when the gap reaches the timeout
    * (session_window merges only strictly-overlapping [ts, ts+gap)
    * intervals). One keyed shuffle; merging is map-side per group.
    */
  private def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        expr("unix_micros(CAST(session_window.start AS TIMESTAMP))").as("start_us"),
        expr("unix_micros(CAST(session_window.end AS TIMESTAMP))").as("end_us"),
        $"n_events")
      .orderBy($"user_id", $"start_us")
  }

  private val sessionWindowSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
      |m AS (
      |  SELECT user_id, tus,
      |    CASE WHEN lag(tus) OVER w IS NULL
      |           OR tus - lag(tus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      |s AS (
      |  SELECT user_id, tus,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tus
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, MIN(tus) AS start_us, MAX(tus) + 1800000000 AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  // ------------------------------------------------------ A/B cohort lift

  /** A/B experiment readout: users deterministically split by md5 parity
    * (the [[SamplingOps]] hash family — no RNG), per-type mean purchase
    * value and relative lift of B over A, with sample variances. All
    * sums are exact integer cents / cents² (map-side combinable); means
    * and variances are single closed-form double expressions of those
    * exact integers — identical formula text on both engines.
    */
  private def abLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"event_type", $"user_id",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("cohort",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long") % 2)
    // cents and cents-squared accumulate in DECIMAL, and the cast
    // happens BEFORE the multiply: a LONG cents*cents wraps per-row
    // (non-ANSI, silently) above ~3e9 cents, while decimal(18)² is
    // exact for any plausible amount and its DECIMAL sum never
    // overflows. The one cast to double at the end is identical
    // across engines.
    val agg = e.groupBy($"event_type", $"cohort")
      .agg(count(lit(1)).as("n"),
        sum($"cents".cast("decimal(18,0)")).as("s"),
        sum($"cents".cast("decimal(18,0)") * $"cents".cast("decimal(18,0)")).as("ss"))
      .withColumn("mean", $"s".cast("double") / $"n".cast("double"))
      .withColumn("variance",
        ($"ss".cast("double") - $"s".cast("double") * $"s".cast("double")
          / $"n".cast("double")) / ($"n".cast("double") - 1.0))
    val a = agg.filter($"cohort" === 0)
      .select($"event_type", $"n".as("n_a"), $"mean".as("mean_a"), $"variance".as("var_a"))
    val b = agg.filter($"cohort" === 1)
      .select($"event_type", $"n".as("n_b"), $"mean".as("mean_b"), $"variance".as("var_b"))
    a.join(b, Seq("event_type"))
      .withColumn("lift", $"mean_b" / $"mean_a" - 1.0)
      .orderBy($"event_type")
  }

  private val abLiftSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS cohort,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |agg AS (
      |  SELECT event_type, cohort, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(cents AS DECIMAL(18,0))) AS s,
      |    SUM(CAST(cents * cents AS DECIMAL(20,0))) AS ss
      |  FROM e GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, cohort, n,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS variance
      |  FROM agg)
      |SELECT a.event_type AS event_type,
      |  a.n AS n_a, a.mean AS mean_a, a.variance AS var_a,
      |  b.n AS n_b, b.mean AS mean_b, b.variance AS var_b,
      |  b.mean / a.mean - 1.0 AS lift
      |FROM m a JOIN m b ON a.event_type = b.event_type
      |  AND a.cohort = 0 AND b.cohort = 1
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------- hourly seasonality

  /** Hour-of-day activity profile per event type: counts and the share
    * of the type's daily cycle — the seasonality fingerprint behind
    * traffic-aware scheduling. One keyed aggregation + broadcast type
    * totals.
    */
  private def hourlySeasonality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"event_type", hour($"ts").cast("long").as("hod"))
    val cnt = e.groupBy($"event_type", $"hod").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"event_type").agg(sum($"n").as("n_type"))
    cnt.join(broadcast(tot), Seq("event_type"))
      .select($"event_type", $"hod", $"n",
        ($"n".cast("double") / $"n_type".cast("double")).as("share"))
      .orderBy($"event_type", $"hod")
  }

  private val hourlySeasonalitySql =
    """WITH c AS (
      |  SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type FROM c GROUP BY 1)
      |SELECT c.event_type AS event_type, hod, n,
      |  CAST(n AS DOUBLE) / CAST(n_type AS DOUBLE) AS share
      |FROM c JOIN t ON c.event_type = t.event_type
      |ORDER BY event_type, hod""".stripMargin

  // ------------------------------------------------------- RFM scoring

  /** Maximum purchasers the EXACT ntile path accepts. Its unpartitioned
    * windows funnel one row per purchaser through a single task's sort —
    * exact quartiles cost a global order BY DESIGN (the `BruteForceMaxDocs`
    * pattern: a bounded verifier, not the production path). Beyond the
    * bound, the guard fails loudly and points at `ev_rfm_cutoffs`.
    */
  val ExactRfmMaxUsers: Long = 10000000L

  /** RFM quartile scoring of purchasers: recency (days since last
    * purchase at the corpus horizon), frequency (purchase count),
    * monetary (exact cents), each ntile(4)-scored with a deterministic
    * user_id tiebreak, combined as rfm = r·100 + f·10 + m.
    *
    * Scale note: this is the DOCUMENTED-EXACT path, bounded by
    * [[ExactRfmMaxUsers]] — ntile over an unpartitioned Window is a
    * SINGLE-PARTITION global sort over one row per purchaser. The
    * unbounded production path is `ev_rfm_cutoffs` below —
    * histogram-derived quartile cutoffs broadcast to a map-side bucket
    * lookup, fully parallel at any user count. The horizon rides a 1-row
    * broadcast.
    */
  private def rfmScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir).filter($"event_type" === "purchase")
      .select($"user_id", ddayCol.cast("long").as("dday"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val purchasers = p.select($"user_id").distinct()
      .limit((ExactRfmMaxUsers + 1).toInt).count()
    require(purchasers <= ExactRfmMaxUsers,
      s"exact RFM ntile scoring is bounded to $ExactRfmMaxUsers purchasers " +
        s"(single-task global sort), got > $ExactRfmMaxUsers; " +
        "use ev_rfm_cutoffs (histogram quartile cutoffs) for unbounded corpora")
    val per = p.groupBy($"user_id")
      .agg(max($"dday").as("last_day"), count(lit(1)).as("freq"),
        sum($"cents").as("monetary"))
    val horizon = per.agg(max($"last_day").as("h"))
    def score(c: org.apache.spark.sql.Column, asc: Boolean) =
      ntile(4).over(if (asc) Window.orderBy(c.asc, $"user_id")
                    else Window.orderBy(c.desc, $"user_id"))
    per.crossJoin(broadcast(horizon))
      .withColumn("recency_days", $"h" - $"last_day")
      // small recency = good → rank descending so quartile 4 = most recent
      .withColumn("r_score", score($"recency_days", asc = false).cast("long"))
      .withColumn("f_score", score($"freq", asc = true).cast("long"))
      .withColumn("m_score", score($"monetary", asc = true).cast("long"))
      .select($"user_id", $"recency_days", $"freq", $"monetary",
        $"r_score", $"f_score", $"m_score",
        ($"r_score" * 100L + $"f_score" * 10L + $"m_score").as("rfm"))
      .orderBy($"user_id")
  }

  private val rfmScoresSql =
    """WITH p AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dday,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |per AS (
      |  SELECT user_id, MAX(dday) AS last_day, CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(cents) AS BIGINT) AS monetary
      |  FROM p GROUP BY user_id),
      |h AS (SELECT MAX(last_day) AS h FROM per),
      |sc AS (
      |  SELECT user_id, h - last_day AS recency_days, freq, monetary,
      |    CAST(NTILE(4) OVER (ORDER BY (h - last_day) DESC, user_id) AS BIGINT) AS r_score,
      |    CAST(NTILE(4) OVER (ORDER BY freq ASC, user_id) AS BIGINT) AS f_score,
      |    CAST(NTILE(4) OVER (ORDER BY monetary ASC, user_id) AS BIGINT) AS m_score
      |  FROM per, h)
      |SELECT user_id, recency_days, freq, monetary, r_score, f_score, m_score,
      |  r_score * 100 + f_score * 10 + m_score AS rfm
      |FROM sc ORDER BY user_id""".stripMargin

  /** RFM quartile scoring, SCALE PATH (the documented alternative to
    * `ev_rfm_scores`' exact single-partition ntile): quartile CUTOFFS
    * come from per-metric VALUE histograms — the running sum rides a
    * window over distinct values, never over users — with pure-integer
    * ceil-rank arithmetic ((N+3) div 4 etc., no float quantile
    * convention to disagree on), then every user scores against the
    * 1-row broadcast cutoffs map-side. Fully parallel at any user
    * count; tie handling differs from ntile by design (ties share a
    * bucket instead of splitting to equalize bucket sizes).
    */
  private def rfmCutoffs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir).filter($"event_type" === "purchase")
      .select($"user_id", ddayCol.cast("long").as("dday"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val per0 = p.groupBy($"user_id")
      .agg(max($"dday").as("last_day"), count(lit(1)).as("freq"),
        sum($"cents").as("monetary"))
    val horizon = per0.agg(max($"last_day").as("h"))
    val per = per0.crossJoin(broadcast(horizon))
      .withColumn("recency_days", $"h" - $"last_day")
      .select($"user_id", $"recency_days", $"freq", $"monetary")
    val vals = per.select(lit("r").as("m"), $"recency_days".as("v"))
      .union(per.select(lit("f").as("m"), $"freq".as("v")))
      .union(per.select(lit("mo").as("m"), $"monetary".as("v")))
    val w = Window.partitionBy($"m").orderBy($"v")
    val hist = vals.groupBy($"m", $"v").agg(count(lit(1)).as("n"))
      .withColumn("c", sum($"n").over(w))
    val n = per.agg(count(lit(1)).as("nn"))
    val cuts = hist.crossJoin(broadcast(n)).groupBy($"m").agg(
      min(when($"c" >= expr("(nn + 3) div 4"), $"v")).as("q1"),
      min(when($"c" >= expr("(nn + 1) div 2"), $"v")).as("q2"),
      min(when($"c" >= expr("(3 * nn + 3) div 4"), $"v")).as("q3"))
    val cutRow = cuts.agg(
      max(when($"m" === "r", struct($"q1", $"q2", $"q3"))).as("rc"),
      max(when($"m" === "f", struct($"q1", $"q2", $"q3"))).as("fc"),
      max(when($"m" === "mo", struct($"q1", $"q2", $"q3"))).as("mc"))
    def asc(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      lit(1L) + (v > c.getField("q1")).cast("long") +
        (v > c.getField("q2")).cast("long") + (v > c.getField("q3")).cast("long")
    per.crossJoin(broadcast(cutRow))
      .select($"user_id", $"recency_days", $"freq", $"monetary",
        (lit(5L) - asc($"recency_days", $"rc")).as("r_score"),
        asc($"freq", $"fc").as("f_score"),
        asc($"monetary", $"mc").as("m_score"))
      .withColumn("rfm", $"r_score" * 100L + $"f_score" * 10L + $"m_score")
      .orderBy($"user_id")
  }

  private val rfmCutoffsSql =
    """WITH p AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dday,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |per0 AS (
      |  SELECT user_id, MAX(dday) AS last_day, CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(cents) AS BIGINT) AS monetary
      |  FROM p GROUP BY user_id),
      |h AS (SELECT MAX(last_day) AS h FROM per0),
      |per AS (SELECT user_id, h - last_day AS recency_days, freq, monetary FROM per0, h),
      |vals AS (
      |  SELECT 'r' AS m, recency_days AS v FROM per
      |  UNION ALL SELECT 'f', freq FROM per
      |  UNION ALL SELECT 'mo', monetary FROM per),
      |hist AS (SELECT m, v, COUNT(*) AS n FROM vals GROUP BY 1, 2),
      |cum AS (SELECT m, v, SUM(n) OVER (PARTITION BY m ORDER BY v) AS c FROM hist),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM per),
      |cuts AS (
      |  SELECT m,
      |    MIN(CASE WHEN c >= (nn + 3) // 4 THEN v END) AS q1,
      |    MIN(CASE WHEN c >= (nn + 1) // 2 THEN v END) AS q2,
      |    MIN(CASE WHEN c >= (3 * nn + 3) // 4 THEN v END) AS q3
      |  FROM cum, nn GROUP BY m)
      |SELECT user_id, recency_days, freq, monetary,
      |  5 - (1 + CAST(recency_days > r.q1 AS BIGINT) + CAST(recency_days > r.q2 AS BIGINT)
      |         + CAST(recency_days > r.q3 AS BIGINT)) AS r_score,
      |  1 + CAST(freq > f.q1 AS BIGINT) + CAST(freq > f.q2 AS BIGINT)
      |    + CAST(freq > f.q3 AS BIGINT) AS f_score,
      |  1 + CAST(monetary > mo.q1 AS BIGINT) + CAST(monetary > mo.q2 AS BIGINT)
      |    + CAST(monetary > mo.q3 AS BIGINT) AS m_score,
      |  (5 - (1 + CAST(recency_days > r.q1 AS BIGINT) + CAST(recency_days > r.q2 AS BIGINT)
      |          + CAST(recency_days > r.q3 AS BIGINT))) * 100
      |    + (1 + CAST(freq > f.q1 AS BIGINT) + CAST(freq > f.q2 AS BIGINT)
      |         + CAST(freq > f.q3 AS BIGINT)) * 10
      |    + (1 + CAST(monetary > mo.q1 AS BIGINT) + CAST(monetary > mo.q2 AS BIGINT)
      |         + CAST(monetary > mo.q3 AS BIGINT)) AS rfm
      |FROM per,
      |  (SELECT * FROM cuts WHERE m = 'r') r,
      |  (SELECT * FROM cuts WHERE m = 'f') f,
      |  (SELECT * FROM cuts WHERE m = 'mo') mo
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------- event transitions

  /** First-order Markov transition matrix over per-user event sequences:
    * count and probability of each (from_type → to_type) step. One lead
    * window per user (single key shuffle), a keyed aggregation, and a
    * broadcast row-total join — the sequence-model feature extraction
    * shape.
    */
  private def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
    val cnt = pairs.groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"from_type").agg(sum($"n").as("n_from"))
    cnt.join(broadcast(tot), Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        ($"n".cast("double") / $"n_from".cast("double")).as("p"))
      .orderBy($"from_type", $"to_type")
  }

  private val markovTransitionsSql =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
      |SELECT c.from_type AS from_type, to_type, n,
      |  CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
      |FROM c JOIN t ON c.from_type = t.from_type
      |ORDER BY from_type, to_type""".stripMargin

  /** Distributed ORDINARY LEAST SQUARES: per event type, the linear
    * trend of daily revenue over day index — closed-form normal
    * equations from five exact integer sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²), so the regression is ONE map-side-combined
    * aggregate regardless of row count, the textbook
    * "model fitting as aggregation" shape (each executor folds its
    * partition's sums; the driver never sees rows). Days are re-indexed
    * from the corpus minimum so every product stays far inside BIGINT
    * at any scale factor; slope and intercept are each a single double
    * division of exact integers, replayed operation-for-operation by
    * the oracle (IEEE-identical).
    */
  private def trendOls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select($"event_type", ddayCol.cast("long").as("x"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"x").agg(sum($"cents").as("y"))
    val m = daily.agg(min($"x").as("x0"))
    daily.crossJoin(broadcast(m))
      .select($"event_type", ($"x" - $"x0").as("xi"), $"y")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"xi").as("sx"), sum($"y").as("sy"),
        sum($"xi" * $"y").as("sxy"), sum($"xi" * $"xi").as("sxx"))
      .filter($"n" >= 2) // n distinct day indexes ⇒ variance > 0
      .withColumn("slope",
        ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
      .withColumn("intercept",
        ($"sy".cast("double") - $"slope" * $"sx".cast("double")) /
          $"n".cast("double"))
      .select($"event_type", $"n".as("n_days"), $"slope", $"intercept")
      .orderBy($"event_type")
  }

  private val trendOlsSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |d AS (SELECT event_type, x, SUM(cents) AS y FROM e GROUP BY 1, 2),
      |m AS (SELECT MIN(x) AS x0 FROM d),
      |di AS (SELECT event_type, x - x0 AS xi, y FROM d CROSS JOIN m),
      |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(xi) AS sx, SUM(y) AS sy, SUM(xi*y) AS sxy, SUM(xi*xi) AS sxx
      |  FROM di GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
      |FROM a WHERE n >= 2 ORDER BY event_type""".stripMargin

  /** Multi-touch LINEAR ATTRIBUTION: each purchase's revenue splits
    * equally across the user's click/view touchpoints in the 7 days
    * before it; purchases with no touches stay in the '(direct)' bucket.
    * Exact integer division — each touch gets `cents DIV n`, the
    * remainder goes to the FIRST touch (by ts, then event_id), so the
    * attributed total reconciles to revenue to the cent and the whole
    * split is oracle-replayable (no floating shares).
    *
    * Scale: the touch window rides an EQUI-join on user_id with a time
    * residual — fan-out per purchase is the user's own touch count in
    * the window, never corpus-wide; the split is one window over each
    * purchase's matched touches (per-purchase cardinality). Same bound
    * as `ev_asof_join`'s keyed shape.
    */
  private def attributionLinear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val windowUs = 7L * 86400L * 1000000L
    val e = Tables.events(s, dir).select($"event_id", $"user_id", $"event_type",
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"tus".as("pts"), $"cents")
    val t = e.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_id".as("tid"), $"tus".as("tts"),
        $"event_type".as("touch_type"))
    val j = p.join(t, Seq("user_id"))
      .filter($"tts" < $"pts" && $"tts" >= $"pts" - windowUs)
    val perP = org.apache.spark.sql.expressions.Window.partitionBy($"pid")
    val split = j
      .withColumn("n", count(lit(1)).over(perP))
      .withColumn("rn", row_number().over(perP.orderBy($"tts", $"tid")))
      .select($"touch_type",
        (expr("cents DIV n") + when($"rn" === 1, expr("cents % n"))
          .otherwise(lit(0L))).as("att"))
    val direct = p.join(j.select($"pid").distinct(), Seq("pid"), "left_anti")
      .select(lit("(direct)").as("touch_type"), $"cents".as("att"))
    split.unionAll(direct)
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_credits"), sum($"att").as("attributed_cents"))
      .orderBy($"touch_type")
  }

  private val attributionLinearSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |p AS (SELECT user_id, event_id AS pid, tus AS pts, cents
      |      FROM e WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id AS tid, tus AS tts, event_type AS touch_type
      |      FROM e WHERE event_type IN ('click', 'view')),
      |j AS (
      |  SELECT p.pid, p.cents, t.touch_type, t.tts, t.tid
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tts < p.pts AND t.tts >= p.pts - 604800000000),
      |s AS (
      |  SELECT touch_type,
      |    cents // COUNT(*) OVER (PARTITION BY pid)
      |      + CASE WHEN ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) = 1
      |             THEN cents % (COUNT(*) OVER (PARTITION BY pid)) ELSE 0 END AS att
      |  FROM j),
      |d AS (
      |  SELECT '(direct)' AS touch_type, cents AS att FROM p
      |  WHERE pid NOT IN (SELECT pid FROM j)),
      |u AS (SELECT * FROM s UNION ALL SELECT * FROM d)
      |SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |  CAST(SUM(att) AS BIGINT) AS attributed_cents
      |FROM u GROUP BY touch_type ORDER BY touch_type""".stripMargin

  /** Event-time DISORDER statistics — the measurement that picks a
    * watermark delay: per user (the keyed-arrival stream the engine's
    * per-routing-key order contract actually governs), the running max
    * of event time over arrival order (event_id) minus each event's own
    * time = how late it arrived relative to its key's high-water mark;
    * rolled up per event type. All integer microseconds.
    *
    * Scale: one window keyed by user_id (state = running max, partitions
    * = users, never a global sort) + one keyed rollup — the same shape
    * at any corpus size. A global-order disorder stat would be a
    * single-reducer sort; the keyed definition is both the scalable one
    * and the one that matches per-key watermarking.
    */
  private def disorderStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
      .withColumn("late_us", max($"tus").over(w) - $"tus")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"late_us" > 0, 1L).otherwise(0L)).as("n_late"),
        max($"late_us").as("max_late_us"),
        sum($"late_us").as("sum_late_us"))
      .orderBy($"event_type")
  }

  private val disorderStatsSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events),
      |l AS (
      |  SELECT event_type,
      |    MAX(tus) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS late_us
      |  FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
      |  CAST(SUM(late_us) AS BIGINT) AS sum_late_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Seasonal-naive FORECAST BACKTEST — the baseline every time-series
    * model must beat, and the shape a capacity-planning pipeline runs
    * nightly: hourly revenue per type, forecast(h) = actual(h − horizon)
    * for the daily (24 h) and weekly (168 h) seasons, scored by exact
    * integer absolute-error sums over the overlap. The forecast join is
    * an EQUI-join on (type, h − horizon) — gap-proof (a missing source
    * hour simply yields no forecast), unlike a row-offset lag which
    * silently misaligns across gaps.
    *
    * Scale: the corpus-linear part is the one hourly aggregation; the
    * backtest then runs on the SERIES (hours × types), which grows with
    * time, not data volume — the defining economy of forecast scoring.
    */
  private def forecastSnaive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").as("h"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"h").agg(sum($"cents").as("y"))
      .localCheckpoint() // actuals and both forecast horizons read it
    val horizons = Seq(24L, 168L)
    horizons.map { hz =>
      hourly.as("a").join(
          hourly.select($"event_type", ($"h" + hz).as("h"), $"y".as("f")).as("b"),
          Seq("event_type", "h"))
        .select($"event_type", lit(hz).as("horizon_h"),
          abs($"y" - $"f").as("abs_err"))
        .groupBy($"event_type", $"horizon_h")
        .agg(count(lit(1)).as("n_hours"),
          sum($"abs_err").as("sum_abs_err"), max($"abs_err").as("max_abs_err"))
    }.reduce(_ unionAll _)
      .orderBy($"event_type", $"horizon_h")
  }

  private val forecastSnaiveSql =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |d AS (SELECT event_type, h, CAST(SUM(cents) AS BIGINT) AS y
      |      FROM e GROUP BY 1, 2),
      |hz(horizon_h) AS (VALUES (CAST(24 AS BIGINT)), (CAST(168 AS BIGINT))),
      |j AS (
      |  SELECT a.event_type, hz.horizon_h, abs(a.y - b.y) AS abs_err
      |  FROM d a CROSS JOIN hz
      |  JOIN d b ON b.event_type = a.event_type AND b.h = a.h - hz.horizon_h)
      |SELECT event_type, horizon_h, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |  CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
      |  CAST(MAX(abs_err) AS BIGINT) AS max_abs_err
      |FROM j GROUP BY 1, 2 ORDER BY event_type, horizon_h""".stripMargin

  /** WINSORIZATION at exact percentile fences — the robust-preprocessing
    * clip every metrics pipeline applies before means/regressions: per
    * event type, p01/p99 cutoffs from the exact HISTOGRAM (the
    * `ev_anomaly_mad`/`ev_rfm_cutoffs` trick — cumulative window over
    * distinct cents values, cardinality = histogram width, never rows),
    * then clamp and report clipped counts + exact sums before/after.
    * Everything integer; the cutoffs themselves are emitted so the
    * clamp is auditable.
    */
  private def winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"event_type",
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"cents")
    val hist = e.groupBy($"event_type", $"cents").agg(count(lit(1)).as("n"))
      .withColumn("c", sum($"n").over(w))
    val tot = e.groupBy($"event_type").agg(count(lit(1)).as("t"))
    val cuts = hist.join(tot, "event_type").groupBy($"event_type").agg(
      min(when($"c" >= expr("(t * 1 + 99) DIV 100"), $"cents")).as("p01"),
      min(when($"c" >= expr("(t * 99 + 99) DIV 100"), $"cents")).as("p99"))
    e.join(cuts, "event_type")
      .select($"event_type", $"cents", $"p01", $"p99",
        greatest($"p01", least($"p99", $"cents")).as("clipped"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"cents" < $"p01", 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when($"cents" > $"p99", 1L).otherwise(0L)).as("n_clip_hi"),
        min($"p01").as("p01"), min($"p99").as("p99"),
        sum($"cents").as("sum_before"), sum($"clipped").as("sum_after"))
      .orderBy($"event_type")
  }

  private val winsorizeSql =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |h AS (SELECT event_type, cents, COUNT(*) AS n FROM e GROUP BY 1, 2),
      |hc AS (SELECT event_type, cents,
      |  SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS c FROM h),
      |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t FROM e GROUP BY 1),
      |cuts AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN c >= (t * 1 + 99) // 100 THEN cents END) AS p01,
      |    MIN(CASE WHEN c >= (t * 99 + 99) // 100 THEN cents END) AS p99
      |  FROM hc JOIN t USING (event_type) GROUP BY event_type)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN cents < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      |  CAST(SUM(CASE WHEN cents > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
      |  CAST(MIN(p01) AS BIGINT) AS p01, CAST(MIN(p99) AS BIGINT) AS p99,
      |  CAST(SUM(cents) AS BIGINT) AS sum_before,
      |  CAST(SUM(greatest(p01, least(p99, cents))) AS BIGINT) AS sum_after
      |FROM e JOIN cuts USING (event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** TRAIN/TEST SPLIT LEAKAGE AUDIT — the ML-hygiene check that a split
    * key must be the ENTITY, not the row: under the by-user md5 split
    * every user's events land wholly in one side (leaked users = 0, by
    * construction — the audit MEASURES it), while the naive by-event
    * split leaks almost every active user into both sides. Both schemes
    * are measured in one row so the contrast is hash-pinned.
    *
    * Scale: two keyed aggregates over (user, side-seen flags) — a
    * boolean OR rollup per user, one shuffle each.
    */
  private def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select($"user_id", $"event_id")
    def h(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long") % 10L
    def audit(scheme: String, side: org.apache.spark.sql.Column) =
      e.select($"user_id", (side < 8L).cast("long").as("tr"))
        .groupBy($"user_id")
        .agg(max($"tr").as("has_train"), max(lit(1L) - $"tr").as("has_test"))
        .agg(count(lit(1)).as("n_users"),
          sum($"has_train" * $"has_test").as("n_leaked"))
        .select(lit(scheme).as("scheme"), $"n_users", $"n_leaked")
    audit("by_user", h($"user_id")).unionAll(audit("by_event", h($"event_id")))
      .orderBy($"scheme")
  }

  private val splitLeakageSql =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS hu,
      |    CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS he
      |  FROM events),
      |u AS (SELECT user_id,
      |    MAX(CASE WHEN hu < 8 THEN 1 ELSE 0 END) AS tr_u,
      |    MAX(CASE WHEN hu >= 8 THEN 1 ELSE 0 END) AS te_u,
      |    MAX(CASE WHEN he < 8 THEN 1 ELSE 0 END) AS tr_e,
      |    MAX(CASE WHEN he >= 8 THEN 1 ELSE 0 END) AS te_e
      |  FROM e GROUP BY user_id)
      |SELECT 'by_event' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(tr_e * te_e) AS BIGINT) AS n_leaked FROM u
      |UNION ALL
      |SELECT 'by_user', CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(tr_u * te_u) AS BIGINT) FROM u
      |ORDER BY scheme""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("ev_winsorize",          winsorize _,         Some(winsorizeSql)),
    ("ds_split_leakage",      splitLeakage _,      Some(splitLeakageSql)),
    ("ev_forecast_snaive",    forecastSnaive _,    Some(forecastSnaiveSql)),
    ("ev_attribution_linear", attributionLinear _, Some(attributionLinearSql)),
    ("ev_disorder_stats",    disorderStats _,     Some(disorderStatsSql)),
    ("ev_trend_ols",         trendOls _,          Some(trendOlsSql)),
    ("ev_ab_lift",           abLift _,            Some(abLiftSql)),
    ("ev_hourly_seasonality", hourlySeasonality _, Some(hourlySeasonalitySql)),
    ("ev_rfm_scores",        rfmScores _,         Some(rfmScoresSql)),
    ("ev_rfm_cutoffs",       rfmCutoffs _,        Some(rfmCutoffsSql)),
    ("ev_session_window",    sessionWindow _,     Some(sessionWindowSql)),
    ("ev_markov_transitions", markovTransitions _, Some(markovTransitionsSql)),
    ("ev_retention_cohorts", retentionCohorts _, Some(retentionCohortsSql)),
    ("ev_window_sliding",    slidingWindow _,    Some(slidingWindowSql)),
    ("ev_dau_stickiness",    dauStickiness _,    Some(dauStickinessSql)),
    ("ev_anomaly_mad",       anomalyMad _,       Some(anomalyMadSql)),
  )
}
