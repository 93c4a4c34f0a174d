package graft.tools

import graft.Tables
import graft.operators.BloomPrefilter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the txt_bloom_contamination
  * pipeline to locate its hot spot.
  */
object BloomBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"BB $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    // same shape as GramStage.gramRows (inlined — GramStage is
    // private[queries])
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("tk"))
      .filter(size($"tk") >= 6)
      .select($"doc_id", transform(sequence(lit(1), size($"tk") - 5),
        i => concat_ws(" ", slice($"tk", i, lit(6)))).as("gs"))
    val train = base.filter($"doc_id" % 10 < 8)
      .select(explode($"gs").as("g")).distinct()

    timeIt("warm docs count")(Tables.documents(spark, sfDir).count())
    timeIt("new train count")(train.count())
    val bloom = timeIt("bloom build")(BloomPrefilter.build(train, $"g"))
    val bloom2 = timeIt("bloom build small")(
      BloomPrefilter.build(train, $"g", 1L << 18, 1L << 21))
    val evalGrams = base.filter($"doc_id" % 10 >= 8)
      .select($"doc_id", explode(array_distinct($"gs")).as("g"))
    timeIt("probe filter count")(
      evalGrams.filter(BloomPrefilter.mightContain(bloom, $"g")).count())
    timeIt("probe small count")(
      evalGrams.filter(BloomPrefilter.mightContain(bloom2, $"g")).count())
    timeIt("semi join only")(
      evalGrams.join(train, Seq("g"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1))).count())
    timeIt("full w/ bloom")(
      evalGrams.filter(BloomPrefilter.mightContain(bloom, $"g"))
        .join(train, Seq("g"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1))).count())
    spark.stop()
  }
}
