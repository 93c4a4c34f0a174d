package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audit: print formatted physical plans for selected queries and
  * flag the properties that matter at 100 TB — parquet pushdown
  * (PushedFilters), narrow ReadSchema, broadcast joins on dims, and
  * whole-stage codegen coverage.
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q2_scan_pushdown", "q4_join_broadcast", "q5_join_multiway",
               "ev_cut_bounded_read", "ev_fetch_event")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // execute THIS plan so AQE finalizes and codegen markers appear
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"########## $n")
      println(plan)
      val executed = df.queryExecution.executedPlan.toString
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "WholeStageCodegen" -> executed.contains("*("),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"))
      println(s"########## $n checks: " +
        checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
