package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop MinHash kernel shared by the interpreted and codegen'd
  * paths of the `minhash_signature` expression. One static method, no
  * allocation beyond the output array, no boxing — C2 compiles the loop
  * once and every Spark task shares it (the higher-order-function
  * formulation of the same math pays interpreted-expression overhead per
  * element and several seconds of first-run JIT warm-up).
  *
  * Hash family: shingle identity is an xxhash64-style fold of the k token
  * hashes in document order; h_j(s) = avalanche(s ^ mix(j)). Statistical
  * requirements (pairwise near-independence across j, uniformity) match
  * the murmur3-seed family it replaces; MinHash recall bounds only need a
  * pseudo-random family, not a specific one.
  */
object MinHashCore {
  // xxhash64 prime constants — public-domain mixing arithmetic
  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val P3 = 1609587929392839161L  // 0x165667B19E3779F9

  @inline private def mix(acc: Long, v: Long): Long = {
    val x = acc ^ (v * P2)
    java.lang.Long.rotateLeft(x, 27) * P1 + P3
  }

  @inline private def avalanche(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33; v *= P2
    v ^= v >>> 29; v *= P3
    v ^= v >>> 32
    v
  }

  /** MinHash signature of the ordered token-hash array: `numHashes` mins
    * over all `shingleSize`-grams. Documents shorter than one shingle use
    * the whole document as the single shingle.
    */
  def signature(tokens: ArrayData, shingleSize: Int, numHashes: Int): Array[Long] = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (n == 0) return mins
    val k = math.min(shingleSize, n)
    val numShingles = n - k + 1
    var i = 0
    while (i < numShingles) {
      var sh = P3
      var t = 0
      while (t < k) { sh = mix(sh, tokens.getLong(i + t)); t += 1 }
      sh = avalanche(sh)
      var j = 0
      while (j < numHashes) {
        val v = avalanche(sh ^ (j * P1 + P2))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }
}
