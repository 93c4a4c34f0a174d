package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for the two-decade sweep: the LSH near-dup queries
  * are OUTPUT-bound (wall tracks the number of true candidate/verified
  * pairs, not the corpus size), and ScaleGen's K× replication grows
  * duplicate DENSITY as well as volume — low-diversity documents whose
  * word-permuted replicas still collide in MinHash bands produce
  * Θ(replicas²) genuine near-dup pairs per original. This prints docs,
  * verified pairs, and wall per dir so growth can be attributed to
  * output size rather than a hidden quadratic in the operator itself
  * (cost/pair should stay ~flat across decades).
  *
  * Usage: runMain graft.tools.PairGrowth <query> <dir> [dir ...]
  */
object PairGrowth {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(query)
    dirs.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir).count()
      fn(spark, dir).count() // cold
      val t0 = System.nanoTime()
      val pairs = fn(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pairs] $query%-20s dir=$dir%-28s docs=$docs%9d rows=$pairs%10d " +
        f"wall=$secs%7.2fs us_per_row=${secs * 1e6 / math.max(pairs, 1)}%8.1f")
    }
    spark.stop()
  }
}
