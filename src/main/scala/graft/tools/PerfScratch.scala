package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler: runs the named queries N times and prints
  * per-iteration timings. Usage: runMain graft.tools.PerfScratch q1 q2 ...
  */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // measurement parity with Bench: same scratch substrate
    System.setProperty("java.io.tmpdir", graft.util.WorkDirs.scratchRoot)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val dur = for (a <- si.submissionTime; b <- si.completionTime) yield b - a
          println(f"STAGE ${si.stageId}%3d ${dur.getOrElse(-1L)}%6dms tasks=${si.numTasks}%3d ${si.name.take(70)}")
        }
      })
    // Job-level attribution (SPARK_GRAFT_JOBS): streaming micro-batches
    // tag their jobs with "... batch = N" in the description, so a job
    // log cleanly separates fixture-construction jobs from per-trigger
    // jobs and exposes driver-side gaps (planning/WAL) between them.
    if (sys.env.contains("SPARK_GRAFT_JOBS"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val desc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(e.jobId, e.time)
          desc.put(e.jobId,
            Option(e.properties.getProperty("spark.job.description")).getOrElse("").take(100))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val d = e.time - t0.getOrDefault(e.jobId, e.time)
          println(f"JOB ${e.jobId}%4d end=${e.time}%d ${d}%6dms ${desc.getOrDefault(e.jobId, "")}")
        }
      })
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() catch { case _: Throwable => }
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash_lsh")
    for (name <- names; it <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"SCRATCH $name it$it rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
