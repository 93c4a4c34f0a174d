package graft.queries

import graft.Tables
import graft.QueryRegistry.Qf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics surface (SURVEY §2.3–§2.5): aggregations, joins,
  * windows, sorts, set ops — expressed declaratively so Catalyst handles
  * pushdown, pruning, join strategy and whole-stage codegen.
  *
  * Oracle-parity conventions (driver hash-compares against DuckDB):
  *  - double aggregates go through exact DECIMAL arithmetic with the final
  *    value cast to DOUBLE — the same textual expression is fed to both
  *    engines, so results are bit-identical regardless of sum order;
  *  - every query ends with a total ORDER BY over its output;
  *  - every computed column is aliased identically on both sides.
  *
  * Scale notes: group keys here are low-cardinality → partial (map-side)
  * aggregation collapses the shuffle; dimension joins use broadcast();
  * fact-fact joins shuffle on the join key, which AQE re-plans at runtime.
  */
object Relational {

  // Shared exact-arithmetic fragments (identical text in Spark + DuckDB).
  private val QTY   = "CAST(l_quantity AS DECIMAL(12,2))"
  private val PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val DISC  = "CAST(l_discount AS DECIMAL(12,2))"
  private val ONE   = "CAST(1 AS DECIMAL(12,2))"
  private val REV   = s"CAST(SUM($PRICE * ($ONE - $DISC)) AS DOUBLE)"
  private val TOTAL = "CAST(o_totalprice AS DECIMAL(12,2))"

  /** TPC-H Q1-style pricing summary: single shuffle on a tiny group key. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        expr(s"CAST(SUM($QTY) AS DOUBLE)").as("sum_qty"),
        expr(s"CAST(SUM($PRICE) AS DOUBLE)").as("sum_base_price"),
        expr(REV).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1AggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM($QTY) AS DOUBLE) AS sum_qty,
       |  CAST(SUM($PRICE) AS DOUBLE) AS sum_base_price,
       |  $REV AS sum_disc_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective scan: predicate + projection must reach the parquet reader
    * (PushedFilters / narrow ReadSchema) — at 100 TB this is the difference
    * between reading 2 columns of a few row groups and the whole table.
    */
  def q2ScanPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("2000-06-01").cast("timestamp_ntz") && $"l_quantity" <= 3)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q2Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00' AND l_quantity <= 3
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Fact-fact join (lineitem ⋈ orders) + agg + global top-k: Catalyst
    * plans a shuffle join on l_orderkey; top-k is TakeOrderedAndProject
    * (no global sort materialization).
    */
  def q3TopkOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(expr(REV).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  private val q3Sql =
    s"""SELECT o_orderkey, o_orderdate, $REV AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderstatus = 'F'
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** Broadcast dimension join: customer is tiny relative to orders — at
    * 100 TB the dim still fits in memory, so hint broadcast explicitly.
    */
  def q4JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           expr(s"CAST(SUM($TOTAL) AS DOUBLE)").as("sum_total"))
      .orderBy($"c_mktsegment")
  }

  private val q4Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  CAST(SUM($TOTAL) AS DOUBLE) AS sum_total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q5-style multiway join: one shuffle join on the fact key plus a
    * chain of broadcast dims (customer → nation → region).
    */
  def q5JoinMultiway(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(expr(REV).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  private val q5Sql =
    s"""SELECT n_name, $REV AS revenue, COUNT(*) AS n_items
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** Left-semi join (EXISTS): no payload columns from the right side cross
    * the shuffle — cheaper than join+distinct.
    */
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.orders(s, dir).filter($"o_totalprice" > 250000.0)
    Tables.customer(s, dir)
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q6Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers who never placed a pending
    * order — non-empty at every scale factor.
    */
  def q7AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pending = Tables.orders(s, dir).filter($"o_orderstatus" === "P")
    Tables.customer(s, dir)
      .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  private val q7Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Per-group top-k via ranking window — partition-parallel, no global
    * state; the window shuffle partitions by o_custkey.
    */
  def q8WindowTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  private val q8Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running (prefix) aggregate per supplier — exact decimal accumulation
    * inside the frame, surfaced as double.
    */
  def q9WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_suppkey" <= 2)
      .selectExpr(
        "l_suppkey", "l_orderkey", "l_linenumber",
        s"""CAST(SUM($PRICE) OVER (
           |  PARTITION BY l_suppkey
           |  ORDER BY l_shipdate, l_orderkey, l_linenumber
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price""".stripMargin)
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  private val q9Sql =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       |  CAST(SUM($PRICE) OVER (
       |    PARTITION BY l_suppkey
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
       |FROM lineitem
       |WHERE l_suppkey <= 2
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Distinct aggregation: Catalyst expands to a two-phase plan. */
  def q10DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"),
           countDistinct($"l_partkey").as("n_parts"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  private val q10Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** ROLLUP hierarchy totals; COALESCE the grouping nulls so both engines
    * sort identically (Spark and DuckDB default null ordering differ).
    */
  def q11Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), expr(s"CAST(SUM($QTY) AS DOUBLE)").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
              coalesce($"l_linestatus", lit("ALL")).as("ls"),
              $"n", $"sum_qty")
      .orderBy($"rf", $"ls")
  }

  private val q11Sql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  COUNT(*) AS n,
       |  CAST(SUM($QTY) AS DOUBLE) AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  /** INTERSECT — hashed distinct set op. */
  def q12Intersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir).filter($"o_totalprice" > 150000.0)
      .select($"o_custkey".as("custkey"))
    val b = Tables.customer(s, dir).filter($"c_acctbal" > 5000.0)
      .select($"c_custkey".as("custkey"))
    a.intersect(b).orderBy($"custkey")
  }

  private val q12Sql =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
      |INTERSECT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
      |ORDER BY custkey""".stripMargin

  /** EXCEPT — anti set op. */
  def q13Except(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.customer(s, dir).select($"c_custkey".as("custkey"))
    val b = Tables.orders(s, dir).filter($"o_totalprice" > 300000.0)
      .select($"o_custkey".as("custkey"))
    a.except(b).orderBy($"custkey")
  }

  private val q13Sql =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY custkey""".stripMargin

  /** Conditional aggregation (TPC-H Q14-style promo share). */
  def q14CaseAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .agg(
        expr(s"CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $PRICE * ($ONE - $DISC) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)").as("promo_rev"),
        expr(REV).as("total_rev"))
      .selectExpr("promo_rev", "total_rev",
        "CAST(100.0 AS DOUBLE) * promo_rev / total_rev AS promo_share")
  }

  private val q14Sql =
    s"""SELECT promo_rev, total_rev,
       |  CAST(100.0 AS DOUBLE) * promo_rev / total_rev AS promo_share
       |FROM (
       |  SELECT
       |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $PRICE * ($ONE - $DISC) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_rev,
       |    $REV AS total_rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey) t""".stripMargin

  /** GROUP BY + HAVING. */
  def q15Having(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           expr(s"CAST(SUM($TOTAL) AS DOUBLE)").as("sum_total"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  private val q15Sql =
    s"""SELECT o_custkey, COUNT(*) AS n_orders,
       |  CAST(SUM($TOTAL) AS DOUBLE) AS sum_total
       |FROM orders
       |GROUP BY o_custkey
       |HAVING COUNT(*) >= 15
       |ORDER BY o_custkey""".stripMargin

  /** Scalar subquery: orders above the global average price. The average is
    * computed once and broadcast — no per-row recomputation.
    */
  def q16ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val avg = o.agg(
      expr(s"CAST(SUM($TOTAL) AS DOUBLE) / COUNT(*)").as("avg_total"))
    o.crossJoin(broadcast(avg))
      .filter($"o_totalprice" > $"avg_total")
      .agg(count(lit(1)).as("n_above"),
           min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
  }

  private val q16Sql =
    s"""SELECT COUNT(*) AS n_above, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
       |FROM orders
       |WHERE o_totalprice > (SELECT CAST(SUM($TOTAL) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin

  val defs: Seq[(String, Qf, Option[String])] = Seq(
    ("q1_agg",             q1Agg _,           Some(q1AggSql)),
    ("q2_scan_pushdown",   q2ScanPushdown _,  Some(q2Sql)),
    ("q3_topk_orders",     q3TopkOrders _,    Some(q3Sql)),
    ("q4_join_broadcast",  q4JoinBroadcast _, Some(q4Sql)),
    ("q5_join_multiway",   q5JoinMultiway _,  Some(q5Sql)),
    ("q6_semi_join",       q6SemiJoin _,      Some(q6Sql)),
    ("q7_anti_join",       q7AntiJoin _,      Some(q7Sql)),
    ("q8_window_topk",     q8WindowTopk _,    Some(q8Sql)),
    ("q9_window_running",  q9WindowRunning _, Some(q9Sql)),
    ("q10_distinct_agg",   q10DistinctAgg _,  Some(q10Sql)),
    ("q11_rollup",         q11Rollup _,       Some(q11Sql)),
    ("q12_intersect",      q12Intersect _,    Some(q12Sql)),
    ("q13_except",         q13Except _,       Some(q13Sql)),
    ("q14_case_agg",       q14CaseAgg _,      Some(q14Sql)),
    ("q15_having",         q15Having _,       Some(q15Sql)),
    ("q16_scalar_subquery", q16ScalarSubquery _, Some(q16Sql)),
  )
}
