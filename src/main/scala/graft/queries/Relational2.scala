package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational wave: outer joins, cube, pivot, percentiles,
  * IN-subqueries, string/date scalar functions, approximate distinct.
  * Same oracle-parity conventions as [[Relational]].
  */
object Relational2 {

  private val TOTAL = "CAST(o_totalprice AS DECIMAL(12,2))"

  /** LEFT OUTER join preserving customers with no matching orders;
    * null-aware aggregation.
    */
  private def q17LeftOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0)
    Tables.customer(s, dir)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
           count($"o_orderkey").as("n_matched"),
           // COUNT(*) − COUNT(col) stays BIGINT on both engines; DuckDB's
           // SUM over integers is HUGEINT → float64 in pandas, which
           // hash-mismatches Spark's bigint even when values are equal
           (count(lit(1)) - count($"o_orderkey")).as("n_unmatched"))
      .orderBy($"c_mktsegment")
  }

  private val q17Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_matched,
      |  COUNT(*) - COUNT(o_orderkey) AS n_unmatched
      |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
      |  ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** FULL OUTER join of two differently-keyed aggregates. */
  private def q18FullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spend = Tables.events(s, dir).filter($"event_type" === "purchase")
      .groupBy($"user_id".as("k")).agg(count(lit(1)).as("n_purchases"))
    val custs = Tables.customer(s, dir).filter($"c_acctbal" > 9000.0)
      .select($"c_custkey".as("k"), $"c_acctbal")
    spend.join(custs, Seq("k"), "full_outer")
      .select($"k",
        coalesce($"n_purchases", lit(0L)).as("n_purchases"),
        coalesce($"c_acctbal", lit(-1.0)).as("acctbal"))
      .orderBy($"k")
  }

  private val q18Sql =
    """SELECT COALESCE(a.k, b.k) AS k,
      |  COALESCE(n_purchases, 0) AS n_purchases,
      |  COALESCE(c_acctbal, -1.0) AS acctbal
      |FROM (SELECT user_id AS k, COUNT(*) AS n_purchases
      |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) a
      |FULL JOIN (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_acctbal > 9000.0) b
      |  ON a.k = b.k
      |ORDER BY k""".stripMargin

  /** CUBE over two dimensions (all 2^2 grouping sets). */
  private def q19Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
           expr(s"CAST(SUM($TOTAL) AS DOUBLE)").as("sum_total"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("st"),
              coalesce($"o_orderpriority", lit("ALL")).as("pri"),
              $"n", $"sum_total")
      .orderBy($"st", $"pri")
  }

  private val q19Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
       |  COALESCE(o_orderpriority, 'ALL') AS pri,
       |  COUNT(*) AS n, CAST(SUM($TOTAL) AS DOUBLE) AS sum_total
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY st, pri""".stripMargin

  /** PIVOT event types to columns (fixed category list → static schema,
    * which is also what keeps it one pass at scale).
    */
  private def q20Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(($"user_id" % 5).as("ub"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy($"ub")
  }

  private val q20Sql =
    """SELECT user_id % 5 AS ub,
      |  COUNT(*) FILTER (event_type = 'click') AS click,
      |  COUNT(*) FILTER (event_type = 'error') AS error,
      |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY ub""".stripMargin

  /** Exact interpolated percentiles per group. */
  private def q21Percentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
           expr("percentile(l_quantity, 0.5)").as("p50"),
           expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy($"l_returnflag")
  }

  private val q21Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** IN-subquery (translated to a semi join by Catalyst). */
  private def q22InSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rich = Tables.customer(s, dir).filter($"c_acctbal" > 8000.0).select($"c_custkey")
    Tables.orders(s, dir)
      .join(rich, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  private val q22Sql =
    """SELECT o_orderstatus, COUNT(*) AS n
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** String scalar functions: case, substring, concat, replace, LIKE. */
  private def q23StringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_name".like("%0001%"))
      .select($"c_custkey",
        upper($"c_name").as("uname"),
        substring($"c_name", 10, 4).as("mid"),
        concat($"c_mktsegment", lit("/"), $"c_name").as("tagged"),
        regexp_replace($"c_name", "0", "#").as("masked"),
        length($"c_name").as("len"))
      .orderBy($"c_custkey")
  }

  private val q23Sql =
    """SELECT c_custkey, upper(c_name) AS uname,
      |  substring(c_name, 10, 4) AS mid,
      |  concat(c_mktsegment, '/', c_name) AS tagged,
      |  regexp_replace(c_name, '0', '#', 'g') AS masked,
      |  length(c_name) AS len
      |FROM customer WHERE c_name LIKE '%0001%'
      |ORDER BY c_custkey""".stripMargin

  /** Date/time scalar functions over order dates. */
  private def q24DateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n"),
           min(dayofmonth($"o_orderdate")).as("first_day"),
           max(dayofmonth($"o_orderdate")).as("last_day"))
      .orderBy($"y", $"m")
  }

  private val q24Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
      |  COUNT(*) AS n,
      |  CAST(MIN(day(o_orderdate)) AS INT) AS first_day,
      |  CAST(MAX(day(o_orderdate)) AS INT) AS last_day
      |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin

  /** approx_count_distinct (HLL sketch) — engines use different sketch
    * implementations, so this is rows-only checked; the exact distinct
    * count is oracle-checked in q10.
    */
  /** approx_count_distinct (HLL++) exercised against the exact count.
    * HLL implementations differ across engines, so the hash-checked
    * output is the exact count plus the invariant that matters — the
    * approximation landed within its error bound (2% default rsd → 5%
    * slack); the oracle asserts the same invariant trivially true.
    */
  private def q25ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.01).as("approx"),
           countDistinct($"l_orderkey").as("exact_orders"))
      .select($"l_returnflag", $"exact_orders",
        (abs($"approx" - $"exact_orders").cast("double") / $"exact_orders" <= 0.05)
          .as("approx_within_5pct"))
      .orderBy($"l_returnflag")
  }

  private val q25Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  true AS approx_within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Explicit GROUPING SETS (beyond rollup/cube): two unrelated
    * dimensions aggregated in one pass over the fact table.
    */
  private def q26GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
         |  COALESCE(o_orderpriority, 'ALL') AS pri,
         |  COUNT(*) AS n, CAST(SUM($TOTAL) AS DOUBLE) AS sum_total
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY st, pri""".stripMargin)
  }

  private val q26Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
       |  COALESCE(o_orderpriority, 'ALL') AS pri,
       |  COUNT(*) AS n, CAST(SUM($TOTAL) AS DOUBLE) AS sum_total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
       |ORDER BY st, pri""".stripMargin

  /** lag/lead event-time deltas per user — the gap-analysis window shape. */
  private def q27LagLead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    Tables.events(s, dir).filter($"user_id" < 50)
      .select($"user_id", $"event_id", unix_millis($"ts".cast("timestamp")).as("tus"))
      .withColumn("gap", $"tus" - lag($"tus", 1).over(w))
      .groupBy($"user_id")
      .agg(count($"gap").as("n_gaps"),
           expr("CAST(SUM(gap) AS DOUBLE) / COUNT(gap)").as("avg_gap_ms"),
           max($"gap").as("max_gap_ms"))
      .orderBy($"user_id")
  }

  private val q27Sql =
    """SELECT user_id, COUNT(gap) AS n_gaps,
      |  CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS avg_gap_ms,
      |  MAX(gap) AS max_gap_ms
      |FROM (
      |  SELECT user_id,
      |    epoch_ms(CAST(ts AS TIMESTAMP)) -
      |      lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER (
      |        PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS gap
      |  FROM events WHERE user_id < 50) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** RANGE frame: trailing-7-day spend per customer ordered by day. */
  private def q28RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day").rangeBetween(-7, Window.currentRow)
    Tables.orders(s, dir).filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate", lit("1992-01-01")).as("day"),
        expr(TOTAL).as("tp"))
      .withColumn("trail7", expr("CAST(SUM(tp) OVER (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE)"))
      .select($"o_custkey", $"o_orderkey", $"day".cast("long").as("day"), $"trail7")
      .orderBy($"o_custkey", $"day", $"o_orderkey")
  }

  private val q28Sql =
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day,
       |  CAST(SUM($TOTAL) OVER (PARTITION BY o_custkey
       |    ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
       |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail7
       |FROM orders WHERE o_custkey < 200
       |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** Correlated EXISTS / NOT EXISTS: segments of customers having urgent
    * orders but no failed ones (semi ∧ anti join composition).
    */
  private def q29Exists(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val failed = orders.filter($"o_orderstatus" === "F").select($"o_custkey")
    Tables.customer(s, dir)
      .join(urgent, $"c_custkey" === urgent("o_custkey"), "left_semi")
      .join(failed, $"c_custkey" === failed("o_custkey"), "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  private val q29Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** ntile / percent_rank / cume_dist — the statistical ranking windows
    * over per-customer spend.
    */
  private def q30RankStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val spend = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(expr(s"CAST(SUM($TOTAL) AS DOUBLE)").as("spend"))
    val w = Window.orderBy($"spend".desc, $"o_custkey")
    spend
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter($"o_custkey" < 100)
      .orderBy($"o_custkey")
  }

  private val q30Sql =
    s"""SELECT * FROM (
       |  SELECT o_custkey, CAST(SUM($TOTAL) AS DOUBLE) AS spend,
       |    NTILE(4) OVER w AS quartile,
       |    PERCENT_RANK() OVER w AS pct_rank,
       |    CUME_DIST() OVER w AS cume
       |  FROM orders GROUP BY o_custkey
       |  WINDOW w AS (ORDER BY CAST(SUM($TOTAL) AS DOUBLE) DESC, o_custkey)) t
       |WHERE o_custkey < 100
       |ORDER BY o_custkey""".stripMargin

  /** approx_percentile (t-digest-style sketch) checked against the exact
    * interpolated percentile: the hash-checked output is the exact value
    * plus the sketch-accuracy invariant (accuracy 10000 → well under 1%
    * rank error on this data).
    */
  private def q31ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
           expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
      .select($"l_returnflag", $"exact_p50",
        (abs($"approx" - $"exact_p50") / $"exact_p50" <= 0.01).as("approx_within_1pct"))
      .orderBy($"l_returnflag")
  }

  private val q31Sql =
    """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS exact_p50,
      |  true AS approx_within_1pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Distribution-position window functions not yet in the inventory:
    * percent_rank and cume_dist over supplier balances per nation
    * (deterministic via the unique suppkey tiebreak).
    */
  private def q32PercentRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal", $"s_suppkey")
    Tables.supplier(s, dir)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy($"s_nationkey", $"s_suppkey")
  }

  private val q32Sql =
    """SELECT s_nationkey, s_suppkey, s_acctbal, pr, cd FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |    PERCENT_RANK() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal, s_suppkey) AS pr,
      |    CUME_DIST() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal, s_suppkey) AS cd
      |  FROM supplier) t
      |ORDER BY s_nationkey, s_suppkey""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("q17_left_outer",      q17LeftOuter _,     Some(q17Sql)),
    ("q32_percent_rank",    q32PercentRank _,   Some(q32Sql)),
    ("q18_full_outer",      q18FullOuter _,     Some(q18Sql)),
    ("q19_cube",            q19Cube _,          Some(q19Sql)),
    ("q20_pivot",           q20Pivot _,         Some(q20Sql)),
    ("q21_percentile",      q21Percentile _,    Some(q21Sql)),
    ("q22_in_subquery",     q22InSubquery _,    Some(q22Sql)),
    ("q23_string_funcs",    q23StringFuncs _,   Some(q23Sql)),
    ("q24_date_funcs",      q24DateFuncs _,     Some(q24Sql)),
    ("q25_approx_distinct", q25ApproxDistinct _, Some(q25Sql)),
    ("q26_grouping_sets",   q26GroupingSets _,  Some(q26Sql)),
    ("q27_lag_lead",        q27LagLead _,       Some(q27Sql)),
    ("q28_range_frame",     q28RangeFrame _,    Some(q28Sql)),
    ("q29_exists",          q29Exists _,        Some(q29Sql)),
    ("q30_rank_stats",      q30RankStats _,     Some(q30Sql)),
    ("q31_approx_percentile", q31ApproxPercentile _, Some(q31Sql)),
  )
}
