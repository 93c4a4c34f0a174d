package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: persisting both join sides bucketed by
  * the join key (Spark's `bucketBy` — hive-style hash bucketing recorded
  * in the catalog) lets a later sort-merge join run with ZERO exchange on
  * either side. At 100 TB this is the difference between re-shuffling a
  * fact table on every join and shuffling it ONCE at ingest — the layout
  * contract `SCALING.md` claims for repeated equi-joins, here
  * plan-gated and value-checked against the plain shuffled join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with no Exchange; rows match the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buck").toString
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    spark.sql("DROP TABLE IF EXISTS g_buck_orders")
    spark.sql("DROP TABLE IF EXISTS g_buck_lineitem")
    try {
      orders.write.format("parquet").option("path", s"$dir/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_buck_orders")
      lineitem.write.format("parquet").option("path", s"$dir/lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("g_buck_lineitem")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("g_buck_lineitem")
          .join(spark.table("g_buck_orders"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
        // value parity with the plain (shuffled) join
        val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
        assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty,
          "bucketed join result differs from the shuffled join")
        // execute joined's OWN QueryExecution (exceptAll above ran a
        // different one) so the plan inspected below is the AQE-final
        // plan, not the initial static plan
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        // the join itself must consume the bucket layout directly: no
        // shuffle below the join (the groupBy above it may exchange —
        // only on 8 bucket-sized inputs, not the raw tables)
        val joinPart = plan.split("SortMergeJoin")
        assert(joinPart.length >= 2, s"expected a sort-merge join:\n$plan")
        assert(!joinPart.last.contains("Exchange"),
          s"join inputs were re-shuffled despite bucketing:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_buck_orders")
      spark.sql("DROP TABLE IF EXISTS g_buck_lineitem")
    }
  }
}
