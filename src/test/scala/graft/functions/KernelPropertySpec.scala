package graft.functions

import graft.core.{MinHashCore, RollingHashCore}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style equivalence checks for the native kernels against
  * straightforward reference implementations — the kernels are hand-
  * rolled loops, so every one gets an independent oracle here (on top of
  * the DuckDB SQL parity the query gate enforces).
  */
class KernelPropertySpec extends AnyFunSuite {
  private def rnd = new Random(7)

  test("SortedIntersectSize == Set intersection size on random sorted arrays") {
    val r = rnd
    (0 until 2000).foreach { _ =>
      val a = Array.fill(r.nextInt(60))(r.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(r.nextInt(60))(r.nextInt(40).toLong).distinct.sorted
      val got = SortedIntersectSize(null, null)
        .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size,
        s"a=${a.mkString(",")} b=${b.mkString(",")}")
    }
  }

  test("MinHashCore: containment — signatures respect Jaccard in expectation") {
    // identical inputs → identical signatures; disjoint inputs → (almost
    // surely) different mins; a superset shares ≥ half the mins with a
    // high-overlap subset. Deterministic seeds keep this stable.
    val r = rnd
    (0 until 200).foreach { _ =>
      val base = Array.fill(50 + r.nextInt(50))(r.nextLong())
      val sig1 = MinHashCore.signature(new GenericArrayData(base), 3, 64)
      val sig2 = MinHashCore.signature(new GenericArrayData(base.clone()), 3, 64)
      assert(sig1.sameElements(sig2), "same input must give the same signature")
    }
    val a = Array.fill(200)(rnd.nextLong())
    val b = Array.fill(200)(rnd.nextLong() ^ 0x5a5a5a5aL)
    val sa = MinHashCore.signature(new GenericArrayData(a), 3, 64)
    val sb = MinHashCore.signature(new GenericArrayData(b), 3, 64)
    assert(sa.zip(sb).count { case (x, y) => x == y } < 8,
      "unrelated docs should share almost no signature positions")
  }

  test("RollingHashCore.winnow == naive Rabin-Karp + window minima") {
    val r = rnd
    def naive(s: String, k: Int, w: Int): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      if (bytes.length < k) return Seq.empty
      val pow = RollingHashCore.powers(k)
      val hs = (0 to bytes.length - k).map { i =>
        (0 until k).map(j => (bytes(i + j) & 0xffL) * pow(j)).sum % RollingHashCore.P
      }
      if (hs.size <= w) Seq(hs.min)
      else (0 to hs.size - w).map(i => hs.slice(i, i + w).min)
    }
    (0 until 500).foreach { _ =>
      val s = r.alphanumeric.take(r.nextInt(120)).mkString
      val k = 1 + r.nextInt(10)
      val w = 1 + r.nextInt(20)
      val got = RollingHashCore.winnow(UTF8String.fromString(s), k, w).toSeq
      assert(got == naive(s, k, w), s"s='$s' k=$k w=$w")
    }
  }

  test("md5ShingleHashes == naive MessageDigest over joined shingles") {
    val r = rnd
    def naive(toks: Seq[String], k: Int): Seq[Long] = {
      if (toks.isEmpty) return Seq.empty
      val kk = math.min(k, toks.size)
      (0 to toks.size - kk).map { i =>
        val sh = toks.slice(i, i + kk).mkString(" ")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(sh.getBytes("UTF-8"))
        val v = (0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL))
        (v >>> 4) % graft.operators.MinHashLSH.OracleP
      }
    }
    (0 until 500).foreach { _ =>
      val toks = Seq.fill(r.nextInt(20))(r.alphanumeric.take(1 + r.nextInt(8)).mkString)
      val k = 1 + r.nextInt(5)
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = graft.operators.MinHashLSH.md5ShingleHashes(arr, k).toSeq
      assert(got == naive(toks, k), s"toks=$toks k=$k")
    }
  }

  test("affineMins == per-j minimum of the affine family") {
    val r = rnd
    (0 until 500).foreach { _ =>
      val hs = Array.fill(1 + r.nextInt(40))(math.abs(r.nextLong()) % graft.operators.MinHashLSH.OracleP)
      val n = 1 + r.nextInt(64)
      val got = graft.operators.MinHashLSH.affineMins(new GenericArrayData(hs), n).toSeq
      val want = (0 until n).map { j =>
        hs.map(x => (x * graft.operators.MinHashLSH.oracleA(j) +
          graft.operators.MinHashLSH.oracleB(j)) % graft.operators.MinHashLSH.OracleP).min
      }
      assert(got == want)
    }
  }

  test("SimHash.signatureOf == per-bit ±1 vote over md5 token hashes") {
    val r = rnd
    def naive(toks: Seq[String]): Long = {
      val hs = toks.map { t =>
        val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        ((0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL))) >>> 4
      }
      (0 until graft.operators.SimHash.Bits).map { i =>
        val votes = hs.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << i else 0L
      }.sum
    }
    (0 until 500).foreach { _ =>
      val toks = Seq.fill(1 + r.nextInt(30))(r.alphanumeric.take(1 + r.nextInt(8)).mkString)
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      assert(graft.operators.SimHash.signatureOf(arr) == naive(toks), s"toks=$toks")
    }
  }

  test("SeqDotProduct == left-to-right double accumulation") {
    val r = rnd
    (0 until 500).foreach { _ =>
      val n = r.nextInt(100)
      val a = Array.fill(n)(r.nextFloat() * 2 - 1)
      val b = Array.fill(n)(r.nextFloat() * 2 - 1)
      val got = SeqDotProduct(null, null)
        .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
      var want = 0.0
      var i = 0
      while (i < n) { want += a(i).toDouble * b(i).toDouble; i += 1 }
      assert(got == want, "accumulation order must be exactly left-to-right")
    }
  }
}
