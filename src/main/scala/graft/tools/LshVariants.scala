package graft.tools

import graft.Tables
import graft.operators.MinHashLSH
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch harness for the round-9 dedup_minhash_lsh cost decomposition:
  * times the production path against a lazy (no-localCheckpoint) variant
  * and a no-window-guard variant, twice each, to attribute the round-8
  * cache-hygiene delta before deciding the fix.
  */
object LshVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"VAR $label t=${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    // lazy variant: same plan, no localCheckpoint; unpersist after consume
    def lazyPairs(docs: DataFrame, guard: Boolean): Long = {
      val numHashes = 64; val bands = 16; val rows = numHashes / bands
      import graft.functions.GraftFunctions.{affine_minhash, md5_shingle_hashes, sorted_intersect_size}
      val base = docs.select(col("doc_id").as("id"), col("text").as("txt"))
        .repartition(col("id"))
        .select(col("id"), split(lower(trim(col("txt"))), "\\s+").as("tk"))
        .select(col("id"),
          array_sort(array_distinct(transform(col("tk"), x => xxhash64(x)))).as("toks"),
          affine_minhash(md5_shingle_hashes(col("tk"), 3), numHashes).as("sig"))
        .persist()
      val banded = base.select(col("id"),
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              md5(array_join(
                transform(slice(col("sig"), b * rows + 1, lit(rows)), v => v.cast("string")),
                "|")).as("bsig"))))
            .as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
        .persist()
      val sized = if (guard) {
        banded.withColumn("bn", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bsig"))))
          .filter(col("bn") <= 4096).drop("bn")
      } else banded
      val candidates = sized.as("x").join(sized.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
        .distinct()
      val a = base.select(col("id").as("a_id"), col("toks").as("a_toks"))
      val b = base.select(col("id").as("b_id"), col("toks").as("b_toks"))
      val pairs = candidates.join(a, "a_id").join(b, "b_id")
        .withColumn("inter", sorted_intersect_size(col("a_toks"), col("b_toks")).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
        .filter(col("jaccard") >= 0.35)
        .select(col("a_id"), col("b_id"), col("jaccard"))
      val n = pairs.count()
      base.unpersist(false)
      banded.unpersist(false)
      n
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup-docs")(docs.count())
    for (i <- 1 to 2)
      time(s"eager-prod-$i")(
        MinHashLSH.nearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.35).count())
    for (i <- 1 to 2) time(s"lazy-guard-$i")(lazyPairs(docs, guard = true))
    for (i <- 1 to 2) time(s"lazy-noguard-$i")(lazyPairs(docs, guard = false))
    for (i <- 1 to 2)
      time(s"eager-prod-again-$i")(
        MinHashLSH.nearDuplicates(docs, "doc_id", "text", 3, 64, 16, 0.35).count())
    spark.stop()
  }
}
