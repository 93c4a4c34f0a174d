package graft.tools

import graft.Tables
import graft.operators.MinHashLSH
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of dedup_clusters at a given sf dir — LSH pair
  * generation vs the connected-components loop vs fixed per-pass
  * scheduling overhead. Usage: SPARK_GRAFT_SF_DIR=… runMain.
  */
object ClusterBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"BREAK $label t=${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    (0 until 2).foreach { run =>
      println(s"== run $run ==")
      val docs = Tables.documents(spark, sfDir).filter($"n_chars" < 200)
      val pairs = time("lsh-pairs") {
        val p = MinHashLSH.nearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.6)
          .select($"a_id", $"b_id").localCheckpoint()
        println(s"  pairs=${p.count()}")
        p
      }
      time("cc-loop") {
        val edges = pairs.select(explode(array(
            struct($"a_id".as("src"), $"b_id".as("dst")),
            struct($"b_id".as("src"), $"a_id".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst")).localCheckpoint()
        var labels = edges.select($"src".as("id")).distinct()
          .select($"id", $"id".as("lbl")).localCheckpoint()
        def step(ls: org.apache.spark.sql.DataFrame) = {
          val prop = edges.join(ls, $"dst" === $"id").select($"src".as("id"), $"lbl")
          val viaLbl = ls.as("x").join(ls.as("y"), col("x.lbl") === col("y.id"))
            .select(col("x.id").as("id"), col("y.lbl").as("lbl"))
          ls.union(prop).union(viaLbl).groupBy($"id").agg(min($"lbl").as("lbl"))
        }
        var converged = false; var lastSum: Option[Long] = None; var iter = 0
        while (!converged && iter < 13) {
          val t0 = System.nanoTime()
          val next = step(step(labels)).localCheckpoint(false)
          val s = next.agg(org.apache.spark.sql.functions.sum($"lbl")).head().getLong(0)
          println(f"  pass $iter ${(System.nanoTime() - t0) / 1e9}%.2fs sum=$s")
          converged = lastSum.contains(s); lastSum = Some(s); labels = next; iter += 1
        }
      }
      time("final-orderBy") {
        println("  rows=" + pairs.sparkSession.emptyDataFrame.sparkSession.range(0).count())
      }
    }
    spark.stop()
  }
}
