package graft.core

import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp k-gram hashing + winnowing document fingerprints
  * (Schleimer/Wilkerson/Aiken's winnowing scheme): hash every k-byte gram
  * with a polynomial rolling hash mod P, then keep the minimum of every
  * w-gram window — the classic near-dup/plagiarism fingerprint set.
  *
  * All arithmetic is modular with terms bounded far under 2^62, so a SQL
  * oracle replays identical values (ord(char) == byte for ASCII corpora;
  * per-term powers are pre-reduced mod P exactly as the generated SQL
  * inlines them).
  */
object RollingHashCore {
  val P: Long = 1000000007L
  val B: Long = 131L

  /** B^j mod P for j in [0, k). */
  def powers(k: Int): Array[Long] = {
    val pow = new Array[Long](k)
    pow(0) = 1L
    var j = 1
    while (j < k) { pow(j) = pow(j - 1) * B % P; j += 1 }
    pow
  }

  /** Winnowed fingerprints of the UTF-8 bytes: min k-gram hash per
    * w-window (single window when fewer than w grams; empty for texts
    * shorter than one gram).
    */
  def winnow(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val n = s.numBytes()
    if (n < k) return Array.empty
    val pow = powers(k)
    val numGrams = n - k + 1
    val hs = new Array[Long](numGrams)
    var i = 0
    while (i < numGrams) {
      var acc = 0L
      var j = 0
      while (j < k) { acc += (s.getByte(i + j) & 0xffL) * pow(j); j += 1 }
      hs(i) = acc % P
      i += 1
    }
    if (numGrams <= w) {
      var m = Long.MaxValue
      var t = 0
      while (t < numGrams) { if (hs(t) < m) m = hs(t); t += 1 }
      Array(m)
    } else {
      val out = new Array[Long](numGrams - w + 1)
      var o = 0
      while (o < out.length) {
        var m = Long.MaxValue
        var t = o
        while (t < o + w) { if (hs(t) < m) m = hs(t); t += 1 }
        out(o) = m
        o += 1
      }
      out
    }
  }
}
