package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev utility: print schema + count for every testdata table, to catch
  * reader incompatibilities (e.g. ns-precision parquet timestamps) early.
  * Usage: runMain graft.tools.Inspect <sfDir>
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, dir, t)
        println(s"=== $t rows=${df.count()} schema=${df.schema.simpleString}")
        df.show(2, 60, vertical = false)
      } catch {
        case e: Throwable => println(s"=== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
