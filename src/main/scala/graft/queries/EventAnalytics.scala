package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table: time-range
  * (interval) joins and funnel/conversion analysis — the shapes a stream
  * consumer runs once events land in the batch tier
  * (reference batch surface: client/.../BatchClientFactory.java:49).
  *
  * Scale notes: the interval join is TIME-BUCKETED — each window of width
  * W is exploded to the (at most two) W-aligned buckets it overlaps and
  * the probe side joins on `(user_id, bucket)`, so Catalyst plans a plain
  * shuffled equi-join with the range predicate as a residual filter.
  * No broadcast-nested-loop, no all-pairs: at 100 TB the shuffle carries
  * each event exactly once and each window at most twice, and AQE's skew
  * split handles hot users. The funnel is two keyed aggregations and one
  * equi-join on `user_id` with a residual time predicate — the classic
  * "first touch → first conversion" shape with no window over the
  * unpartitioned table.
  */
object EventAnalytics {

  /** Interval-join window width: 10 minutes in microseconds. The bucket
    * width equals the window width, so a window spans at most 2 buckets —
    * the fan-out bound of the bucketed range-join trick.
    */
  private val W = 600000000L

  /** For every `error` event: how many events (and purchases) the same
    * user produced in the following 10 minutes — incident-impact
    * attribution as a bucketed interval join.
    */
  private def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("tus", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id", $"tus".as("t0"))
    // each window [t0, t0+W] overlaps exactly the buckets of its two
    // endpoints (distinct-deduped when both land in one bucket)
    val errB = errs.select($"err_id", $"user_id", $"t0",
      explode(array_distinct(array(
        expr(s"t0 DIV $W"), expr(s"(t0 + $W) DIV $W")))).as("bk"))
    val evB = ev.select($"user_id", $"tus", $"event_type",
      expr(s"tus DIV $W").as("bk"))
    // an event matches at most ONE of a window's bucket rows (its own
    // bucket), so the equi-join introduces no duplicates to de-count
    val hits = errB.join(evB, Seq("user_id", "bk"))
      .filter($"tus" > $"t0" && $"tus" <= $"t0" + W)
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n_follow"),
           sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchase"))
    errs.join(hits, Seq("err_id"), "left")
      .select($"err_id", $"user_id",
        coalesce($"n_follow", lit(0L)).as("n_follow"),
        coalesce($"n_purchase", lit(0L)).as("n_purchase"))
      .orderBy($"err_id")
  }

  private val intervalJoinSql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
       |  FROM events),
       |err AS (SELECT event_id AS err_id, user_id, tus AS t0
       |        FROM e WHERE event_type = 'error'),
       |f AS (
       |  SELECT err_id, CAST(COUNT(*) AS BIGINT) AS n_follow,
       |    CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
       |  FROM err JOIN e ON err.user_id = e.user_id
       |    AND e.tus > err.t0 AND e.tus <= err.t0 + $W
       |  GROUP BY err_id)
       |SELECT err.err_id, err.user_id,
       |  COALESCE(n_follow, 0) AS n_follow,
       |  COALESCE(n_purchase, 0) AS n_purchase
       |FROM err LEFT JOIN f USING (err_id)
       |ORDER BY err_id""".stripMargin

  /** Signup→purchase conversion funnel: per user, the first signup, the
    * first purchase strictly after it, and the time-to-convert.
    */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("tus", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val su = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"tus").as("first_signup"))
    val pu = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"tus")
    su.as("s").join(pu.as("p"),
        col("p.user_id") === col("s.user_id") &&
          col("p.tus") > col("s.first_signup"), "left")
      .groupBy(col("s.user_id").as("user_id"), col("s.first_signup").as("first_signup"))
      .agg(min(col("p.tus")).as("first_purchase"))
      .select($"user_id", $"first_signup", $"first_purchase",
        when($"first_purchase".isNotNull, 1L).otherwise(0L).as("converted"),
        ($"first_purchase" - $"first_signup").as("us_to_convert"))
      .orderBy($"user_id")
  }

  private val funnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      |  FROM events),
      |s AS (SELECT user_id, MIN(tus) AS first_signup
      |      FROM e WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (
      |  SELECT s.user_id, s.first_signup, MIN(p.tus) AS first_purchase
      |  FROM s LEFT JOIN e p ON p.user_id = s.user_id
      |    AND p.event_type = 'purchase' AND p.tus > s.first_signup
      |  GROUP BY s.user_id, s.first_signup)
      |SELECT user_id, first_signup, first_purchase,
      |  CAST(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS converted,
      |  first_purchase - first_signup AS us_to_convert
      |FROM c ORDER BY user_id""".stripMargin

  /** Top user-journey paths: the 25 most common CONSECUTIVE event-type
    * trigrams across per-user timelines (the path-mining extension of
    * ev_markov_transitions' bigram matrix — "what do users actually do in
    * sequence", the funnel-discovery primitive). Order within a user is
    * (ts, event_id) — a total order, so both engines walk identical
    * timelines.
    *
    * Scale: one window partitioned by user_id carries two leads — the
    * shuffle is the per-user repartition the timeline needs anyway; the
    * trigram count is a map-combined keyed aggregation, and the final
    * top-25 is a TakeOrderedAndProject over the (tiny) distinct-trigram
    * set, never a global row sort.
    */
  private def topPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
      .withColumn("t2", lead($"event_type", 1).over(w))
      .withColumn("t3", lead($"event_type", 2).over(w))
      .filter($"t3".isNotNull)
      .groupBy($"event_type".as("step1"), $"t2".as("step2"), $"t3".as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"step1", $"step2", $"step3")
      .limit(25)
  }

  private val topPathsSql =
    """WITH t AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3
      |  FROM (SELECT user_id, event_id, event_type,
      |          epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events) e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      |SELECT event_type AS step1, t2 AS step2, t3 AS step3,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM t WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, step1, step2, step3 LIMIT 25""".stripMargin

  /** CUSUM changepoint detection per event type: the day where the
    * cumulative deviation of the daily count from the type's own mean
    * peaks — the classic single-changepoint estimator (argmax |S_t| of
    * the centered cumulative sum, binary-segmentation step 1). All
    * arithmetic is kept in scaled integers: S_t·n = n·Σ_{i≤t}x_i − t·T
    * (n = #days, T = total), so both engines compare exact BIGINTs and
    * ties break on the earlier day.
    *
    * Scale: one map-combined daily rollup, then every window is
    * partitioned by event_type — per-type state is #days rows, the
    * argmax is a rank-1 filter (WindowGroupLimit), and nothing global
    * ever sorts.
    */
  private def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
    val wtot = Window.partitionBy($"event_type")
    val wrun = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("n", count(lit(1)).over(wtot))
      .withColumn("total", sum($"x").over(wtot))
      .withColumn("t", row_number().over(wrun).cast("long"))
      .withColumn("run", sum($"x").over(wrun))
      .withColumn("s", $"n" * $"run" - $"t" * $"total")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy(abs($"s").desc, $"day")))
      .filter($"rk" === 1)
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("cp_day"),
        abs($"s").as("s_abs"))
      .orderBy($"event_type")
  }

  private val cusumChangepointSql =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, day,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
      |    CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS run
      |  FROM d),
      |s AS (
      |  SELECT event_type, day, n * run - t * total AS s,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY abs(n * run - t * total) DESC, day) AS rk
      |  FROM c)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
      |  CAST(abs(s) AS BIGINT) AS s_abs
      |FROM s WHERE rk = 1 ORDER BY event_type""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("ev_interval_join", intervalJoin _, Some(intervalJoinSql)),
    ("ev_funnel",        funnel _,       Some(funnelSql)),
    ("ev_top_paths",     topPaths _,     Some(topPathsSql)),
    ("ev_cusum_changepoint", cusumChangepoint _, Some(cusumChangepointSql)),
  )
}
