package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-semantics operators from SURVEY §2.1/§2.4/§2.11 mapped onto the
  * driver's `events` table, which stands in for one Pravega stream:
  * `user_id % 8` plays the routing-key→segment hash
  * (reference: client/.../stream/impl/SegmentSelector.java:87) and
  * `event_id` plays the per-segment byte offset
  * (client/.../stream/impl/EventPointerImpl.java:42).
  *
  * Everything is expressed as declarative DataFrame ops so offset/segment
  * predicates push down to the scan — the 100 TB analog of Pravega's
  * StreamCut → byte-range pruning (BatchClientFactory.java:80).
  */
object EventsStream {

  private val SEG = "user_id % 8"
  private val VAL = "CAST(value AS DECIMAL(18,6))"

  /** Consumption surface: per-event-type counts + exact value totals. */
  private def evCountByType(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           expr(s"CAST(SUM($VAL) AS DOUBLE)").as("sum_value"))
      .orderBy($"event_type")
  }

  private val evCountByTypeSql =
    s"""SELECT event_type, COUNT(*) AS n, CAST(SUM($VAL) AS DOUBLE) AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** EVENT_COUNT segment attribute analog (Attributes.java:66): per-segment
    * running event count + offset bounds.
    */
  private def evSegmentCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(expr(s"$SEG").as("segment"), $"event_id")
      .groupBy($"segment")
      .agg(count(lit(1)).as("event_count"),
           min($"event_id").as("start_offset"),
           max($"event_id").as("tail_offset"))
      .orderBy($"segment")
  }

  private val evSegmentCountsSql =
    s"""SELECT $SEG AS segment, COUNT(*) AS event_count,
       |  MIN(event_id) AS start_offset, MAX(event_id) AS tail_offset
       |FROM events GROUP BY 1 ORDER BY segment""".stripMargin

  /** Bounded batch read between two StreamCuts [300, 400)
    * (BatchClientFactory.java:92 readSegment) — offset predicate prunes at
    * the scan, rows come back in offset order.
    */
  private def evCutBoundedRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_id" >= 300 && $"event_id" < 400)
      .select(expr(s"$SEG").as("segment"), $"event_id", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

  private val evCutBoundedReadSql =
    s"""SELECT $SEG AS segment, event_id, user_id, event_type
       |FROM events WHERE event_id >= 300 AND event_id < 400
       |ORDER BY event_id""".stripMargin

  /** fetchEvent(EventPointer) random access (EventStreamReader.java:82):
    * a point lookup that prunes to a single row group/file at scale.
    */
  private def evFetchEvent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_id" === 500)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
  }

  private val evFetchEventSql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |FROM events WHERE event_id = 500""".stripMargin

  /** getSegmentsAtTime(stream, t) (Controller.java:388): first offset at or
    * after an event-time instant, per segment.
    */
  private def evSegmentsAtTime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"ts" >= lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
      .groupBy(expr(s"$SEG").as("segment"))
      .agg(min($"event_id").as("position"))
      .orderBy($"segment")
  }

  private val evSegmentsAtTimeSql =
    s"""SELECT $SEG AS segment, MIN(event_id) AS position
       |FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
       |GROUP BY 1 ORDER BY segment""".stripMargin

  /** getDistanceBetweenTwoStreamCuts (StreamManager.java:261): per-segment
    * span between cuts.
    */
  private def evCutDistance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_id" >= 100 && $"event_id" < 800)
      .groupBy(expr(s"$SEG").as("segment"))
      .agg(count(lit(1)).as("n_events"),
           (max($"event_id") - min($"event_id")).as("span"))
      .orderBy($"segment")
  }

  private val evCutDistanceSql =
    s"""SELECT $SEG AS segment, COUNT(*) AS n_events,
       |  MAX(event_id) - MIN(event_id) AS span
       |FROM events WHERE event_id >= 100 AND event_id < 800
       |GROUP BY 1 ORDER BY segment""".stripMargin

  /** Watermark computation (PeriodicWatermarking.java:254): writer marks =
    * per-writer max event time; writers idle longer than the aggregation
    * timeout (7 days here) are excluded from the lower bound.
    */
  private def evWatermarkBounds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val marks = Tables.events(s, dir)
      .groupBy($"user_id").agg(max($"ts").as("mark"))
    val maxMark = marks.agg(max($"mark").as("max_mark"))
    marks.crossJoin(broadcast(maxMark))
      .filter(expr("mark >= max_mark - INTERVAL 7 DAY"))
      .agg(min($"mark").as("lower_bound"),
           max($"mark").as("upper_bound"),
           count(lit(1)).as("n_active_writers"))
  }

  private val evWatermarkBoundsSql =
    """WITH marks AS (
      |  SELECT user_id, CAST(MAX(ts) AS TIMESTAMP) AS mark FROM events GROUP BY user_id),
      |m AS (SELECT MAX(mark) AS max_mark FROM marks)
      |SELECT MIN(mark) AS lower_bound, MAX(mark) AS upper_bound,
      |  COUNT(*) AS n_active_writers
      |FROM marks, m WHERE mark >= max_mark - INTERVAL 7 DAY""".stripMargin

  /** Per-routing-key ordered processing: sessionize with a 30-minute gap —
    * the batch analog of session_window over a keyed stream. Partitioned by
    * writer, so state never exceeds one key's events.
    */
  private def evSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("tus", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .withColumn("prev", lag($"tus", 1).over(w))
      .withColumn("new_session",
        when($"prev".isNull || $"tus" - $"prev" > 1800000000L, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
           expr("CAST(SUM(new_session) AS BIGINT)").as("n_sessions"))
      .orderBy($"user_id")
  }

  private val evSessionizeSql =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
      |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Event-time tumbling window aggregation — the batch shape of the
    * streaming `window($"ts", "1 day")` query.
    */
  private def evWindowTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 day").getField("start").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
           expr(s"CAST(SUM($VAL) AS DOUBLE)").as("sum_value"))
      .orderBy($"day", $"event_type")
  }

  private val evWindowTumblingSql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       |  COUNT(*) AS n, CAST(SUM($VAL) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** Payload deserialization surface (Serializer<T> analog): extract a JSON
    * field from the payload column and aggregate on it.
    */
  private def evJsonProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", expr("CAST(get_json_object(props, '$.k') AS INT)"))
      .groupBy(expr("k % 10").as("bucket"))
      .agg(count(lit(1)).as("n"), expr("CAST(SUM(k) AS BIGINT)").as("sum_k"))
      .orderBy($"bucket")
  }

  private val evJsonPropsSql =
    """SELECT k % 10 AS bucket, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Stream-table enrichment join: events against the broadcast customer
    * dimension (stream-static join shape in Structured Streaming).
    */
  private def evEnrichJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"c_mktsegment", $"event_type")
  }

  private val evEnrichJoinSql =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /** Stream-dimension enrichment through the SALTED join path
    * (operators/SaltedJoin) — the manual hot-key remedy, driver-checked
    * for semantic equivalence: the oracle is the PLAIN SQL join, so a
    * hash match proves salting changes the shuffle layout and nothing
    * else. (The AQE runtime alternative is gated in AqeSkewSpec.)
    */
  private def evSaltedEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables.events(s, dir).select($"user_id".as("k"), $"event_type")
    val dim = Tables.customer(s, dir).select($"c_custkey".as("k"), $"c_mktsegment")
    graft.operators.SaltedJoin.join(fact, dim, "k", saltCount = 8)
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"c_mktsegment", $"event_type")
  }

  private val evSaltedEnrichSql =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /** Per-segment append rates over 2-minute windows — the batch shape of
    * the auto-scaler's EWMA input (SegmentStatsRecorderImpl.java:246).
    */
  private def evRateWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("w", expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 120000000"))
      .groupBy(expr(s"$SEG").as("segment"), $"w")
      .agg(count(lit(1)).as("n"),
           expr("CAST(COUNT(*) AS DOUBLE) / 120.0").as("rate_per_sec"))
      .orderBy($"segment", $"w")
  }

  private val evRateWindowsSql =
    s"""SELECT $SEG AS segment, epoch_us(CAST(ts AS TIMESTAMP)) // 120000000 AS w,
       |  COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) / 120.0 AS rate_per_sec
       |FROM events GROUP BY 1, 2 ORDER BY segment, w""".stripMargin

  /** Weighted heavy hitters through the mergeable Misra–Gries sketch
    * (operators/FrequencySketch.scala): top event types by exact value
    * weight. The run is pinned inside the sketch's exactness domain
    * (distinct event types ≤ capacity ⇒ err = 0, count_lo = count_hi),
    * so the oracle's plain GROUP BY must match bit for bit — proving the
    * sketch path (typed Aggregator, map-side partial sketches, merge
    * order arbitrary) computes true frequencies when it claims
    * exactness. The adversarial (compressing) regime is bound-checked
    * in FrequencySketchSpec, where exact answers don't exist.
    */
  private def evHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.FrequencySketch
    FrequencySketch.topK(
      Tables.events(s, dir),
      "event_type",
      expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"),
      k = 4, capacity = 8)
  }

  private val evHeavyHittersSql =
    """SELECT event_type,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS count_lo,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS count_hi
      |FROM events GROUP BY event_type
      |ORDER BY count_lo DESC, event_type LIMIT 4""".stripMargin

  /** Distinct users per event type through the KMV distinct-count
    * sketch (operators/DistinctSketch): k smallest md5-prefix hashes per
    * group, merged map-side — ≤ k longs cross the shuffle per group per
    * task no matter the cardinality, and the sketch is persistable/
    * mergeable across runs. Unlike HLL, BOTH branches are
    * bit-reproducible and oracle-replayed: below k distinct the sketch
    * IS the answer (sf0.001 exercises this), above it the
    * (k-1)·2^60/h_k order-statistics estimate is exact integer
    * arithmetic the oracle recomputes from the k-th smallest hash
    * (sf0.01+, 150 distinct vs k=64). Merge-shape independence is the
    * sketch's defining property — the k smallest are the k smallest
    * under any partitioning (property-fuzzed in DistinctSketchSpec).
    */
  private def evDistinctKmv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.DistinctSketch
    val k = 64
    val sketches = Tables.events(s, dir)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new DistinctSketch.KmvAgg(k).toColumn)
      .collect() // bounded: one row per event type
    sketches.toSeq
      .map { case (et, kmv) => (et, kmv.estimate, if (kmv.isExact) 1 else 0) }
      .toDF("event_type", "est_distinct", "exact")
      .orderBy($"event_type")
  }

  private val evDistinctKmvSql =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM events),
      |r AS (SELECT event_type, h,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS d
      |  FROM h)
      |SELECT event_type,
      |  CASE WHEN d < 64 THEN CAST(d AS BIGINT)
      |       ELSE CAST((CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT)) // h AS BIGINT)
      |  END AS est_distinct,
      |  CASE WHEN d < 64 THEN 1 ELSE 0 END AS exact
      |FROM r WHERE rn = CASE WHEN d < 64 THEN d ELSE 64 END
      |ORDER BY event_type""".stripMargin

  /** Sample-based quantiles through the deterministic bottom-k sketch
    * (operators/BottomKSample): per event type, the 64 rows with the
    * smallest md5(event_id) hashes form a uniform sample whose content
    * is a pure function of the input set — identical under any
    * partitioning/merge/retry — and the rank-based quantile of the
    * sampled value micros is therefore bit-reproducible, which is what
    * lets the oracle replay BOTH the sample membership (k smallest
    * hashes via ROW_NUMBER) and the quantile ranks. Spark's own
    * percentile/approx_percentile cover query-time quantiles
    * (q21/ev_anomaly_mad); this is the persistable/mergeable form a
    * corpus-statistics pipeline stores and unions across shards.
    */
  private def evQuantilesBk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.BottomKSample
    val k = 64
    val sketches = Tables.events(s, dir)
      .select($"event_type",
        conv(substring(md5($"event_id".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new BottomKSample.SampleAgg(k).toColumn)
      .collect() // bounded: one sketch row per event type
    sketches.toSeq
      .map { case (et, sk) =>
        (et, sk.quantile(0.5), sk.quantile(0.9), sk.values.size.toLong)
      }
      .toDF("event_type", "p50", "p90", "n_sample")
      .orderBy($"event_type")
  }

  private val evQuantilesBkSql =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
      |  FROM events),
      |s AS (SELECT event_type, h, v,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, v) AS rn
      |  FROM h),
      |kk AS (SELECT event_type, v FROM s WHERE rn <= 64),
      |r AS (SELECT event_type, v,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS vr,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM kk)
      |SELECT event_type,
      |  MAX(CASE WHEN vr = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END) AS p50,
      |  MAX(CASE WHEN vr = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END) AS p90,
      |  CAST(MAX(n) AS BIGINT) AS n_sample
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin

  /** COUNT-MIN point-frequency sketch — the fourth member of the
    * deterministic mergeable-summary family (frequencies-above-budget =
    * Misra–Gries, cardinality = KMV, samples/quantiles = bottom-k;
    * Count-Min answers point estimates for ANY key, not just the heavy
    * ones, with a one-sided overcount). Depth 4 × width 64 with
    * md5-derived row hashes, built as a fully declarative plan: each key
    * explodes into its 4 (row, cell) coordinates, the sketch is the
    * map-combined GROUP BY over them — O(depth·width) crosses the
    * shuffle regardless of key cardinality — and a point estimate is the
    * MIN over one probe per row. Cell-wise addition merges sketches
    * across shards/days (it's just a further GROUP BY), and the fixed
    * hash family is why the oracle can replay every cell and every probe
    * bit for bit.
    */
  private def evCountminPoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 4
    val w = 64
    def cellOf(key: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(r.cast("string"), lit(":"), key)), 1, 15), 16, 10)
        .cast("long") % w
    val rowsArr = array((0 until d).map(lit): _*)
    val ev = Tables.events(s, dir).select($"user_id".cast("string").as("k"))
    val cells = ev.select(explode(rowsArr).as("r"), $"k")
      .select($"r", cellOf($"k", $"r").as("cell"))
      .groupBy($"r", $"cell").agg(count(lit(1)).as("cnt"))
    val probes = s.range(10).select($"id".cast("string").as("qk"))
      .select($"qk", explode(rowsArr).as("r"))
      .select($"qk", $"r", cellOf($"qk", $"r").as("cell"))
    val est = probes.join(cells, Seq("r", "cell"), "left")
      .groupBy($"qk").agg(min(coalesce($"cnt", lit(0L))).as("est"))
    val exact = ev.groupBy($"k").agg(count(lit(1)).as("n_exact"))
    est.join(exact.withColumnRenamed("k", "qk"), Seq("qk"), "left")
      .select($"qk".cast("long").as("user_id"),
        coalesce($"n_exact", lit(0L)).as("n_exact"), $"est",
        ($"est" - coalesce($"n_exact", lit(0L))).as("overcount"))
      .orderBy($"user_id")
  }

  private val evCountminPointSql =
    """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
      |rr AS (SELECT unnest(range(4)) AS r),
      |cells AS (
      |  SELECT r, CAST(concat('0x',
      |      substring(md5(concat(CAST(r AS VARCHAR), ':', k)), 1, 15)) AS BIGINT) % 64 AS cell,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM ev CROSS JOIN rr GROUP BY 1, 2),
      |qk AS (SELECT unnest(range(10)) AS uid),
      |probes AS (
      |  SELECT uid, r, CAST(concat('0x',
      |      substring(md5(concat(CAST(r AS VARCHAR), ':', CAST(uid AS VARCHAR))), 1, 15)) AS BIGINT) % 64 AS cell
      |  FROM qk CROSS JOIN rr),
      |est AS (
      |  SELECT uid, MIN(COALESCE(cnt, 0)) AS est
      |  FROM probes LEFT JOIN cells USING (r, cell) GROUP BY uid),
      |ex AS (SELECT CAST(k AS BIGINT) AS uid, CAST(COUNT(*) AS BIGINT) AS n_exact
      |       FROM ev GROUP BY 1)
      |SELECT CAST(uid AS BIGINT) AS user_id,
      |  COALESCE(n_exact, CAST(0 AS BIGINT)) AS n_exact, CAST(est AS BIGINT) AS est,
      |  CAST(est - COALESCE(n_exact, 0) AS BIGINT) AS overcount
      |FROM est LEFT JOIN ex USING (uid) ORDER BY user_id""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("ev_countmin_point",  evCountminPoint _,  Some(evCountminPointSql)),
    ("ev_quantiles_bk",    evQuantilesBk _,    Some(evQuantilesBkSql)),
    ("ev_distinct_kmv",    evDistinctKmv _,    Some(evDistinctKmvSql)),
    ("ev_heavy_hitters",   evHeavyHitters _,   Some(evHeavyHittersSql)),
    ("ev_count_by_type",   evCountByType _,    Some(evCountByTypeSql)),
    ("ev_rate_windows",    evRateWindows _,    Some(evRateWindowsSql)),
    ("ev_segment_counts",  evSegmentCounts _,  Some(evSegmentCountsSql)),
    ("ev_cut_bounded_read", evCutBoundedRead _, Some(evCutBoundedReadSql)),
    ("ev_fetch_event",     evFetchEvent _,     Some(evFetchEventSql)),
    ("ev_segments_at_time", evSegmentsAtTime _, Some(evSegmentsAtTimeSql)),
    ("ev_cut_distance",    evCutDistance _,    Some(evCutDistanceSql)),
    ("ev_watermark_bounds", evWatermarkBounds _, Some(evWatermarkBoundsSql)),
    ("ev_sessionize",      evSessionize _,     Some(evSessionizeSql)),
    ("ev_window_tumbling", evWindowTumbling _, Some(evWindowTumblingSql)),
    ("ev_json_props",      evJsonProps _,      Some(evJsonPropsSql)),
    ("ev_enrich_join",     evEnrichJoin _,     Some(evEnrichJoinSql)),
    ("ev_salted_enrich",   evSaltedEnrich _,   Some(evSaltedEnrichSql)),
  )
}
