package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: curve golden values, and the MEASURED data-skipping
  * claim — a z-clustered parquet layout lets file-level min/max stats
  * prune a two-sided box predicate that a single-column sort cannot.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue golden values (8-bit interleave)") {
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (255L, 0L), (0L, 255L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
      .select(ZOrderLayout.zValue("x", "y", 8).cast("long").as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x contributes odd bit positions, y even: z(x,0)=spread(x)<<1, z(0,y)=spread(y)
    assert(z == Seq(0L, 2L, 1L, 3L, 0xAAAAL, 0x5555L, 0xFFFFL,
      // 170 = 10101010b -> odd positions; 85 = 01010101b -> even positions
      (0 until 8).map(i => ((170L >> i) & 1L) << (2 * i + 1) |
        ((85L >> i) & 1L) << (2 * i)).sum))
  }

  test("8-bit interleave is a bijection onto [0, 65536) with quadrant locality") {
    val grid = spark.range(65536).select(
      ($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val z = grid.select($"x", $"y",
      ZOrderLayout.zValue("x", "y", 8).cast("long").as("z")).cache()
    // bijection: every 16-bit value hit exactly once
    assert(z.select($"z").distinct().count() === 65536L)
    val mm = z.agg(min($"z"), max($"z")).head()
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 65535L)
    // quadrant locality — the data-skipping property in closed form:
    // each top-4-bit curve slice fixes 2 high bits of EACH dim, so over
    // the full grid every slice spans exactly a 64×64 rectangle
    val quad = z.groupBy(expr("z DIV 4096").as("zbin"))
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"),
        count(lit(1)).as("n"))
    assert(quad.count() === 16L)
    assert(quad.filter($"xr" =!= 63L || $"yr" =!= 63L || $"n" =!= 4096L).isEmpty)
    z.unpersist()
  }

  test("z-clustered layout prunes a 2-D box predicate; 1-D sort cannot") {
    // Uniform synthetic points in [0,256)²: x sequential, y decorrelated
    // via a Knuth-multiplicative scramble.
    val n = 65536
    val pts = spark.range(n).select(
      ($"id" % 256).as("x"),
      (($"id" * 2654435761L) % 256).as("y"))
    val files = 16
    val zdir = java.nio.file.Files.createTempDirectory("graft-zord").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    ZOrderLayout.clusteredWrite(pts, ZOrderLayout.zValue("x", "y", 8), zdir, files,
      zSpan = 65536L)
    // the 1-D alternative: same file count, sorted by x only
    pts.repartitionByRange(files, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(ldir)

    // file-level min/max footer stats, as a scan planner would read them
    def bounds(dir: String): Seq[(Long, Long, Long, Long)] = {
      val fs = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
      fs.map { f =>
        val r = spark.read.parquet(f)
          .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // 2-D box: one quarter of each dimension -> 1/16 of the space
    val (x0, x1, y0, y1) = (64L, 127L, 128L, 191L)
    def touched(bs: Seq[(Long, Long, Long, Long)]): Int =
      bs.count { case (mnx, mxx, mny, mxy) =>
        mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1 }
    val zb = bounds(zdir); val lb = bounds(ldir)
    assert(zb.size == files && lb.size == files)
    val (zt, lt) = (touched(zb), touched(lb))
    // x-sort prunes x (4/16 files) but every surviving file spans all of
    // y; the z layout bounds BOTH dims, touching ~area-fraction of files.
    assert(zt < lt, s"z-order touched $zt files, x-sort $lt — no win")
    assert(zt <= files / 2, s"z-order touched $zt of $files files")
    // and on a predicate over the UNSORTED dimension alone, the x-sorted
    // layout reads everything while z-order still prunes
    def touchedY(bs: Seq[(Long, Long, Long, Long)]): Int =
      bs.count { case (_, _, mny, mxy) => mxy >= y0 && mny <= y1 }
    assert(touchedY(lb) == files, "x-sorted layout should be blind to y")
    assert(touchedY(zb) < files, "z layout must bound y too")
  }

  test("clustered layout is deterministic: same data, same file rectangles") {
    val pts = spark.range(65536).select(
      ($"id" % 256).as("x"), (($"id" * 2654435761L) % 256).as("y"))
    val dirs = Seq.fill(2)(
      java.nio.file.Files.createTempDirectory("graft-zdet").toString)
    dirs.foreach { d =>
      ZOrderLayout.clusteredWrite(pts, ZOrderLayout.zValue("x", "y", 8), d, 16,
        zSpan = 65536L)
    }
    def rects(dir: String): Set[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
        .map { (f: String) =>
          val r = spark.read.parquet(f)
            .agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    val Seq(a, b) = dirs.map(rects)
    assert(a == b, "file rectangles must not depend on run history")
    // equal-width curve bins fix the top 2 bits of EACH dim: every file
    // is (a subset of) one 64x64 quadrant-of-quadrant rectangle
    assert(a.forall { case (mnx, mxx, mny, mxy) =>
      mnx / 64 == mxx / 64 && mny / 64 == mxy / 64 })
  }

  test("binning is exact past double precision (bits > 26)") {
    // bits = 31 → zSpan = 4^31 = 2^62, binW = 2^60 for 4 files. Double
    // division rounds (2^60 - 1) / 2^60 to 1.0, misplacing the last row
    // of bin 0 into bin 1; integral DIV must keep every boundary exact.
    val numFiles = 4
    val zSpan = 1L << 62
    val binW = (zSpan + numFiles - 1) / numFiles // 2^60
    val cases = spark.range(1).select(
      lit(binW - 1L).as("z0"),      // last value of bin 0
      lit(binW).as("z1"),           // first value of bin 1
      lit(2L * binW - 1L).as("z2"), // last value of bin 1
      lit(zSpan - 1L).as("z3"))     // last value of the whole curve
    val r = cases.select(
      (for (c <- Seq("z0", "z1", "z2", "z3")) yield
        least(call_function("div", col(c), lit(binW)).cast("int"),
          lit(numFiles - 1)).as(c)): _*).head()
    assert(r.getInt(0) == 0, s"bin(binW-1) = ${r.getInt(0)} (double rounding)")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 3)
    // and the double-division shape really IS wrong here (the regression
    // this guards against): (binW-1)/binW rounds up to bin 1
    val bad = cases.select((col("z0").cast("long") / binW).cast("int")).head().getInt(0)
    assert(bad == 1, "double division unexpectedly exact — test premise broken")
  }
}
