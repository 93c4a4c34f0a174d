package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hot-key story this engine tells for 100 TB (SCALING.md: "skewed
  * keys → salting or AQE skew-join") asserted in CI rather than cited:
  * a join where one key owns ~95 % of the probe side must get its
  * oversized shuffle partition SPLIT by AQE's skew-join rule at
  * runtime, so no single task sorts the hot key alone. Thresholds are
  * scaled down so the corpus stays test-sized; the mechanism is the
  * same one a production hot routing key rides.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits the hot-key partition of a shuffled join at runtime") {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // 95 % of the probe side lands on key 0 — one oversized partition
    val left = s.range(0, 200000).select(
      when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"),
      concat(lit("pad-pad-pad-pad-"), $"id").as("payload"))
    val right = s.range(0, 997).select($"id".as("k"), $"id".as("v"))

    val joined = left.join(right, "k")
    // collect() drives THIS DataFrame's QueryExecution (count() would
    // plan a fresh one and leave joined's AQE plan unfinalized)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not split the skewed join partition:\n$plan")
  }
}
