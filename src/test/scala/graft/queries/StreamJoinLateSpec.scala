package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ev_stream_join_late must prove join-STATE EVICTION, not merely agree
  * with a batch join: the emitted pair set has to equal the on-time
  * subset (purchases from the corpus's last 21 days) and be STRICTLY
  * smaller than the full batch join — otherwise the oracle row is
  * vacuous and the watermark horizon never dropped anything.
  */
class StreamJoinLateSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("late purchases are evicted: emitted = on-time subset ⊊ full join") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val minMs = ev.agg(min(unix_millis($"ts".cast("timestamp")))).as[Long].head()
    val cutMs = minMs + 9L * 86400000L
    def side(t: String) = ev.filter($"event_type" === t).select(
      $"user_id", $"event_id", unix_millis($"ts".cast("timestamp")).as("ms"))
    val a = side("signup").toDF("u", "ea", "ta")
    val b = side("purchase").toDF("u2", "eb", "tb")
    val full = a.join(b, $"u" === $"u2" && $"tb" >= $"ta" && $"tb" <= $"ta" + 3600000L)
    val onTime = full.filter($"tb" >= cutMs)
    val nFull = full.count()
    val nOnTime = onTime.count()
    assert(nOnTime < nFull,
      s"no late pairs in the corpus ($nOnTime == $nFull) — the eviction row is vacuous")
    assert(nOnTime > 0L, "on-time join is empty — nothing exercises the emit path")

    val expected = onTime
      .groupBy($"u".as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        md5(concat_ws(",", array_sort(collect_list(
          format_string("%08d:%08d", $"ea", $"eb"))))).as("chain"))
      .orderBy($"user_id")
    val emitted = SparkEntry.queries("ev_stream_join_late")(spark, sf)
    assert(emitted.collect().toSeq === expected.collect().toSeq,
      "emitted pairs differ from the on-time batch join")
    assert(emitted.agg(sum($"n_pairs")).as[Long].head() === nOnTime)
  }
}
