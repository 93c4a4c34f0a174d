package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection, entirely in codegen'd
  * array expressions and native kernels (no UDFs, no driver-side state):
  *
  *   tokens → k-token shingles → shingle hash → `numHashes` affine
  *   min-hashes → `bands` band signatures → shuffle on (band, signature)
  *   → candidate pairs → exact Jaccard verification.
  *
  * The production path [[nearDuplicates]] uses a CROSS-ENGINE-REPRODUCIBLE
  * hash family (md5-derived shingle ids + modular affine permutations), so
  * the DuckDB oracle can replay the FULL pipeline — shingling, signatures,
  * banding, candidate generation and verification are all hash-checked,
  * not just sampled for recall. [[fastNearDuplicates]] keeps the
  * maximum-throughput xxhash64/murmur3 family for when reproducibility is
  * not needed.
  *
  * At 100 TB the only shuffles are the band-bucket exchange (width =
  * numHashes longs per doc, not the text) and the pair verification join;
  * identical-document floods land in one bucket but are bounded by
  * per-bucket pair expansion, which AQE skew-split handles.
  */
object MinHashLSH {

  /** Per-document MinHash signature as an array<bigint> column
    * (fast murmur3 family — not oracle-reproducible).
    */
  def signature(tokens: Column, shingleSize: Int, numHashes: Int): Column = {
    val shingles = array_distinct(
      when(size(tokens) >= shingleSize,
        transform(sequence(lit(0), size(tokens) - shingleSize),
          i => concat_ws(" ", slice(tokens, i + 1, lit(shingleSize)))))
        .otherwise(array(concat_ws(" ", tokens))))
    val hs = transform(shingles, s => xxhash64(s))
    // hash family h_j(x) = murmur3(x, j): j acts as the seed column, no
    // overflow under ANSI mode, still a fixed pseudo-random map per j
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(hs, h => hash(h, j))))
  }

  // ---------------------------------------------------------------- hash family

  /** Cross-engine-reproducible hash family: shingle identity = first 15
    * hex chars of md5 (exists identically in DuckDB), permutations
    * h_j(x) = (x·A_j + B_j) mod P — modular affine arithmetic that stays
    * under 2^62, so DuckDB's overflow-checking BIGINT math computes the
    * exact same values Spark's wrapping longs do.
    */
  val OracleP: Long = 2147483647L
  def oracleA(j: Int): Long = (2654435761L * (j + 1)) % OracleP
  def oracleB(j: Int): Long = (40503L * (j.toLong * j + 1) + 17) % OracleP

  /** Kernel for the `md5_shingle_hashes` expression: for every k-token
    * shingle (tokens joined by a single space, the whole document when
    * shorter), the first 15 hex chars of its md5 as a bigint mod P —
    * byte-for-byte the value of DuckDB/Spark SQL's
    * `CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT) % P`, computed
    * in one pass without per-shingle string/expression overhead.
    */
  def md5ShingleHashes(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
                       shingleSize: Int): Array[Long] = {
    val n = tokens.numElements()
    if (n == 0) return Array.empty
    val k = math.min(shingleSize, n)
    val out = new Array[Long](n - k + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = ' '.toByte
    var i = 0
    while (i < out.length) {
      md.reset()
      var t = 0
      while (t < k) {
        if (t > 0) md.update(space)
        md.update(tokens.getUTF8String(i + t).getBytes)
        t += 1
      }
      val d = md.digest()
      // value of the first 15 hex digits = first 8 bytes big-endian >>> 4
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (v >>> 4) % OracleP
      i += 1
    }
    out
  }

  /** Kernel for the `affine_minhash` expression: n minima of
    * (x·A_j + B_j) mod P over the input hashes (all values < P, products
    * < P² < 2^62 — the same arithmetic the generated oracle SQL inlines).
    */
  def affineMins(hashes: org.apache.spark.sql.catalyst.util.ArrayData,
                 numHashes: Int): Array[Long] = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var j0 = 0
    while (j0 < numHashes) { as(j0) = oracleA(j0); bs(j0) = oracleB(j0); j0 += 1 }
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (x * as(j) + bs(j)) % OracleP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  // ------------------------------------------------------------ production path

  /** Candidate near-duplicate pairs with exact-Jaccard verification, on
    * the reproducible hash family (so a SQL oracle can replay every
    * stage — see [[oraclePairsCtes]]). Input needs `idCol` (long) and
    * `textCol` (string); output: (a_id, b_id, jaccard) for verified pairs
    * ≥ threshold. Only 3-token shingles are supported (the SQL generator
    * inlines that width).
    *
    * One map-side pass computes BOTH the verification token set (sorted
    * 64-bit interned hashes → zero-allocation merge intersection; the
    * Jaccard VALUE equals raw-token Jaccard, collisions ~1e-10) and the
    * MinHash signature via the native md5+affine kernels — no shuffle, no
    * interpreted higher-order functions in the hot loop. Band signatures
    * are md5 over the '|'-joined row minima, identical to the oracle's
    * `md5(concat_ws('|', …))`.
    *
    * The verified pairs are materialized EAGERLY (localCheckpoint) so the
    * two intermediate caches can be unpersisted before returning — a
    * long-lived session invoking this repeatedly must not accumulate
    * leaked cached partitions (the round-8 scale bench measured exactly
    * that: cache-eviction churn, not the plan, dominating repeat runs).
    *
    * `maxBucketSize` drops band buckets larger than the cap from
    * candidate generation — the hot-bucket guard: a boilerplate flood
    * sharing one band signature otherwise costs C(n,2) verification
    * pairs (quadratic in the flood — the one term AQE skew-split can
    * parallelize but not shrink). A capped bucket's members still pair
    * through any of their other bands, so only docs similar ONLY via the
    * flooded band lose recall; all-band floods are exact duplicates,
    * which exact dedup upstream removes. The oracle SQL replays the same
    * cap.
    */
  /** Per-document reproducible band signatures `(id, band, bsig)` — the
    * LSH index entries, one row per (doc, band). Pure codegen'd
    * expressions on the oracle-replayable hash family: no shuffle, no
    * state — so it runs identically on batch AND STREAMING DataFrames
    * (the index-at-ingest path keys streaming state by (band, bsig)).
    */
  def bandSignatures(docs: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 64, bands: Int = 16): DataFrame = {
    import graft.functions.GraftFunctions.{affine_minhash, md5_shingle_hashes}
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    docs
      .select(col(idCol).as("id"), split(lower(trim(col(textCol))), "\\s+").as("tk"))
      .select(col("id"), affine_minhash(md5_shingle_hashes(col("tk"), 3), numHashes).as("sig"))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            md5(array_join(
              transform(slice(col("sig"), b * rows + 1, lit(rows)), v => v.cast("string")),
              "|")).as("bsig"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
  }

  /** DETERMINISTIC-INPUT REQUIREMENT (both this and [[fastNearDuplicates]]):
    * since r14 the input is scanned THREE times (bucket counts, self-join
    * feed, verification semi-join) with no persisted snapshot — the price
    * of never materializing anything corpus-sized. A non-deterministic
    * `docs` (sample/limit without a seed-stable plan, ids minted by
    * `monotonically_increasing_id`, a table mutating under the read) can
    * present different rows per scan, silently dropping or corrupting
    * pairs. Feed a deterministic source (parquet snapshot, stable ids);
    * when in doubt, `docs.select(id, text).localCheckpoint()` first —
    * that narrow projection is the ONE intermediate worth pinning.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                     threshold: Double = 0.35,
                     maxBucketSize: Int = DefaultMaxBucketSize,
                     maxCandidates: Long = AutoMaxCandidates): DataFrame = {
    import graft.functions.GraftFunctions.{affine_minhash, md5_shingle_hashes, sorted_intersect_size}
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(shingleSize == 3, "the oracle-reproducible path fixes shingleSize = 3")
    val rows = numHashes / bands

    // NOTHING corpus-sized is ever materialized (r14: the fifth-decade
    // probe filled a 90 GB disk at 5×10⁷ docs — twice — before this
    // shape. First the old `base` cache, carrying every doc's full
    // distinct-token-hash array: an intermediate the candidate BUDGET
    // does not bound, ~corpus-sized on disk. Then the banded cache plus
    // BOTH self-join shuffle legs, each O(corpus × bands) bytes). What
    // persists now, and why each is bounded:
    //  - `dup` collision buckets (inside boundedBuckets): O(buckets
    //    with ≥ 2 members) — proportional to true near-dup density, not
    //    corpus size; singleton buckets (the overwhelming majority on a
    //    healthy corpus) never leave the map-combined aggregate.
    //  - `candidates` (a_id, b_id): O(maxCandidates) rows by the
    //    adaptive-cap construction — the budget knob IS its bound.
    //  - `verif` token arrays: built by SEMI-JOINING the corpus to the
    //    candidate id set and re-tokenizing only the survivors —
    //    O(candidate ids) ≤ 2×budget docs, NOT O(corpus).
    // The minhash kernel consequently runs twice (once for the bucket
    // counts, once feeding the self-join) — a deliberate CPU-for-disk
    // trade: recompute is a scan-side pass that scales with executors,
    // while a corpus-sized cache is storage pressure every executor
    // pays at exactly the scale where it hurts. The self-join's
    // exchange carries only collision-bucket rows (the semi-join drops
    // singletons — identical candidates, since singletons cannot pair),
    // and bsig is unhex(md5): equality-identical buckets, ~3× narrower
    // rows than the hex string in every exchange.
    // Raw text is repartitioned FIRST so tokenization and hashing
    // spread across all cores even when the corpus arrives as one file.
    val narrow = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val banded = narrow
      .repartition(col("id"))
      .select(col("id"), split(lower(trim(col("txt"))), "\\s+").as("tk"))
      .select(col("id"),
        affine_minhash(md5_shingle_hashes(col("tk"), shingleSize), numHashes).as("sig"))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            unhex(md5(array_join(
              transform(slice(col("sig"), b * rows + 1, lit(rows)), v => v.cast("string")),
              "|"))).as("bsig"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))

    // Cache lifecycle rides in try/finally: the saturation guard and any
    // failed job between persist() and release would otherwise leave the
    // caches pinned — and a session that hits the designed fail-loud
    // path, raises the budget knob, and retries would accumulate leaked
    // cached partitions, largest exactly in the saturated regime where
    // memory is already the problem (r14 ADVICE).
    val cacheSigs = persistSignatures(narrow)
    val bandedIn = if (cacheSigs) banded.persist() else banded
    val (sized, dupCache) = boundedBuckets(bandedIn, maxBucketSize,
      resolvedMaxCandidates(docs.sparkSession, maxCandidates))
    var candidates: DataFrame = null
    var verif: DataFrame = null
    try {
      candidates = sized.as("x").join(sized.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
        .distinct()
        .persist()

      val candIds = candidates.select(col("a_id").as("id"))
        .union(candidates.select(col("b_id").as("id"))).distinct()
      verif = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
        .join(candIds, Seq("id"), "left_semi")
        .select(col("id"),
          array_sort(array_distinct(
            transform(split(lower(trim(col("txt"))), "\\s+"), x => xxhash64(x)))).as("toks"))
        .persist()

      val a = verif.select(col("id").as("a_id"), col("toks").as("a_toks"))
      val b = verif.select(col("id").as("b_id"), col("toks").as("b_toks"))
      candidates.join(a, "a_id").join(b, "b_id")
        .withColumn("inter", sorted_intersect_size(col("a_toks"), col("b_toks")).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .localCheckpoint() // eager: pairs computed here, caches released in finally
    } finally {
      // audit the ACTUAL cached bytes before release (BRANCHLOG): the
      // heap-relative cap below rests on the banded-rows blow-up factor
      // being a large multiple of the narrow estimate — keep it measured
      if (cacheSigs && sys.env.contains("SPARK_GRAFT_BRANCHLOG")) {
        val st = docs.sparkSession.sparkContext.getRDDStorageInfo
        println(s"BRANCH lsh.bandedCacheBytes mem=${st.map(_.memSize).sum} " +
          s"disk=${st.map(_.diskSize).sum}")
      }
      dupCache.unpersist(false)
      if (cacheSigs) bandedIn.unpersist(false)
      if (candidates != null) candidates.unpersist(false)
      if (verif != null) verif.unpersist(false)
    }
  }

  /** Banded-signature cache (`spark.graft.lsh.persistSignatures`): trade
    * ~(28 bytes × bands) of storage per doc (≈22 GB at 5×10⁷ docs / 16
    * bands) for running the minhash kernel ONCE instead of twice. The
    * r14 fifth-decade probe established that corpus-sized storage is the
    * resource that actually dies first at scale (recompute is a
    * scan-side pass that parallelizes with executors; cached
    * corpus-sized partitions are pressure every executor pays), so
    * recompute stays the policy for large corpora. Since r15 the default
    * is SIZE-ADAPTIVE rather than always-off: when the optimizer's size
    * estimate for the narrow (id, text) projection fits
    * [[AutoPersistMaxBytesConf]] (default 2 GiB — banded rows are the
    * same order as the raw text, comfortably inside storage memory on
    * any executor that holds a 2 GiB scan), the banded rows persist and
    * both the bucket counts and the self-join feed reuse one kernel
    * pass; above it, or when the estimate is unavailable, recompute —
    * exactly the r14 behavior the fifth-decade probe validated. An
    * explicit true/false in the conf always wins. Results are identical
    * either way (same deterministic kernel on the same input).
    */
  val PersistSignaturesConf = "spark.graft.lsh.persistSignatures"

  /** Ceiling (bytes) on the optimizer size estimate of the (id, text)
    * projection under which the banded rows are persisted by default.
    */
  val AutoPersistMaxBytesConf = "spark.graft.lsh.autoPersistMaxBytes"
  val DefaultAutoPersistMaxBytes: Long = 2L * 1024 * 1024 * 1024

  /** Adaptive-branch audit trail (`SPARK_GRAFT_BRANCHLOG`): one line per
    * cache/pin decision so a scale probe can PROVE which branch ran
    * (r16, verdict item 7 — the fallbacks had only been reasoned about).
    */
  @inline private[graft] def logBranch(site: String, pin: Boolean, est: BigInt): Unit =
    if (sys.env.contains("SPARK_GRAFT_BRANCHLOG"))
      println(s"BRANCH $site pin=$pin est=$est")

  private def persistSignatures(narrow: DataFrame): Boolean = {
    val s = narrow.sparkSession
    s.conf.getOption(PersistSignaturesConf).map(_.trim.toBoolean).getOrElse {
      val confCap = s.conf.getOption(AutoPersistMaxBytesConf).map(_.trim.toLong)
        .getOrElse(DefaultAutoPersistMaxBytes)
      // HEAP-RELATIVE ceiling on the auto decision (r16 fifth-decade
      // probe): at estimate 759 MB on an 8 GiB heap the pinned banded
      // rows OOM'd the sf300 leg outright (UnsafeKVExternalSorter heap
      // exhaustion under the self-join agg), while the >cap recompute
      // branch completed the 3.3×-larger sf1000 leg on the same code.
      // The blow-up is MEASURED, not assumed: `lsh.bandedCacheBytes`
      // recorded 3.30 GB of cache for a 25 MB estimate (~130× — the
      // optimizer estimates the compressed parquet scan, the cache holds
      // 16 exploded band rows per doc in columnar batches). An absolute
      // byte cap is only meaningful relative to executor memory:
      // heap/512 keeps the post-blow-up pin ≈25% of the heap, leaving
      // execution headroom for the bucket agg + self-join. An explicit
      // persistSignatures=true still forces the cache.
      val cap = math.min(confCap, Runtime.getRuntime.maxMemory() / 512)
      val est = narrow.queryExecution.optimizedPlan.stats.sizeInBytes
      val pin = est >= 0 && est <= cap
      logBranch("lsh.persistSignatures", pin, est)
      pin
    }
  }

  /** Gate for pinning DERIVED data whose size is a multiple of the source
    * estimate (r15 verdict/advice: the gram-explosion pins in
    * DedupOps/CurationOps gated the exploded stream on the RAW corpus
    * estimate, so a corpus just under the 2 GiB cap could pin ~gramSize×
    * that). The blow-up factor scales the estimate before the compare: a
    * word k-gram explosion emits ≤ k gram rows per token, each ~k tokens
    * long plus per-row id/overhead, so callers pass ~2·k. Same cap conf
    * as the signature cache; conservative (unknown estimate → no pin).
    */
  def pinEstimateFits(src: DataFrame, blowUp: Long): Boolean =
    pinEstimateFits(src, blowUp, "pinEstimateFits")

  def pinEstimateFits(src: DataFrame, blowUp: Long, site: String): Boolean = {
    val s = src.sparkSession
    val cap = s.conf.getOption(AutoPersistMaxBytesConf).map(_.trim.toLong)
      .getOrElse(DefaultAutoPersistMaxBytes)
    val est = src.queryExecution.optimizedPlan.stats.sizeInBytes
    val pin = est >= 0 && est * blowUp <= cap
    logBranch(site, pin, est)
    pin
  }

  /** Hot-bucket guard + CANDIDATE-VOLUME budget. The per-bucket cap alone
    * bounds each bucket's pairs at C(cap, 2) but not their SUM: on a
    * corpus whose signature space saturates (shingle vocabulary fixed
    * while the corpus grows — the regime the prefix join's guard detects
    * on the exact path), bucket sizes grow WITH the corpus, so candidate
    * volume Σ C(n_b, 2) goes quadratic while every bucket still sits
    * under the cap. The fourth-decade probe measured exactly that:
    * 5×10⁵ docs verified fine, 1.5×10⁷ docs filled an 80 GB disk with
    * one candidate shuffle (r12).
    *
    * So the cap is chosen ADAPTIVELY: from the exact bucket-size
    * histogram (one map-combined aggregate over the banded rows — tiny:
    * one row per distinct size), pick the largest cap ≤ `maxBucketSize`
    * whose kept-bucket pair sum fits `maxCandidates`, which makes the
    * candidate shuffle O(budget) BY CONSTRUCTION at any corpus size. At
    * every tested scale factor the estimate sits far under the default
    * budget, so the effective cap equals `maxBucketSize` and results —
    * and the SQL oracle, which replays that cap — are unchanged;
    * shrinking only engages in the saturated regime, where over-cap
    * buckets are signature floods by construction (a bucket's members
    * still pair through their other bands). A corpus so saturated that
    * even size-2 buckets blow the budget fails loudly like the prefix
    * guard, naming the knob.
    *
    * Both paths unify into ONE shape (r14): candidates can only form
    * inside buckets with ≥ 2 members, so the self-join input is the
    * banded rows SEMI-joined to the kept COLLISION-bucket set
    * (2 ≤ bn ≤ cap). That is exactly the old anti-join against over-cap
    * buckets minus the singleton rows — which produce no pairs, so the
    * candidate set is identical — and it is the scale-correct shape
    * twice over: the collision-bucket set is O(true near-dup density),
    * tiny on healthy corpora (AQE broadcasts it, so the semi-join
    * re-shuffles NOTHING), and the self-join's exchange then carries
    * only collision rows instead of the whole corpus × bands.
    * Returns (sized, dupBuckets-cache) — the caller releases the cache
    * after the pairs materialize (the semi-join consumes it lazily).
    */
  private def boundedBuckets(banded: DataFrame, maxBucketSize: Int,
                             maxCandidates: Long): (DataFrame, DataFrame) = {
    val dup = banded.groupBy(col("band"), col("bsig"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") >= 2)
      .persist()
    // Release the cache if anything between persist() and the return
    // throws — chooseBucketCap's saturation failure is DESIGNED to throw
    // here, and that is exactly the regime where the collision-bucket
    // cache is largest (r14 ADVICE: a retry-after-raising-the-knob
    // session would otherwise accumulate the leak).
    try {
      val hist = dup.groupBy(col("bn"))
        .agg(count(lit(1)).as("nbuckets"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val effCap = chooseBucketCap(hist, maxBucketSize, maxCandidates)
      val keep = dup.filter(col("bn") <= effCap).select(col("band"), col("bsig"))
      (banded.join(keep, Seq("band", "bsig"), "left_semi"), dup)
    } catch {
      case t: Throwable => dup.unpersist(false); throw t
    }
  }

  /** Largest bucket cap ≤ `maxBucketSize` with Σ_{2 ≤ n_b ≤ cap}
    * C(n_b, 2) ≤ `maxCandidates`, from an exact (bucketSize, numBuckets)
    * histogram. Deterministic in the data. Throws when no cap ≥ 2 fits —
    * the saturation failure mode, loud by contract.
    */
  private[graft] def chooseBucketCap(hist: Seq[(Long, Long)], maxBucketSize: Int,
                                     maxCandidates: Long): Int = {
    var cum = 0L
    var lastFit = -1L // largest histogram size whose cumulative sum fits
    var overflowed = false
    for ((sz, nb) <- hist.sortBy(_._1) if sz <= maxBucketSize && !overflowed) {
      val add = nb * (sz * (sz - 1) / 2)
      if (cum + add <= maxCandidates) { cum += add; lastFit = sz }
      else overflowed = true
    }
    if (!overflowed) maxBucketSize // every under-base-cap size fits
    else if (lastFit >= 2) lastFit.toInt
    else throw new IllegalArgumentException(
      s"minhash-lsh candidate estimate exceeds $maxCandidates at every " +
        "bucket cap - the signature space has saturated (bucket sizes " +
        "grow with the corpus, so qualifying candidates are inherently " +
        s"quadratic); raise maxCandidates (session conf $MaxCandidatesConf," +
        " or the explicit argument) to the cluster's shuffle capacity or " +
        "shard the corpus")
  }

  /** Hot-bucket cap shared by the Scala paths and the oracle generator —
    * far above any bucket at the tested scale factors (results identical
    * with or without it there), a hard quadratic bound PER BUCKET at
    * corpus scale; [[boundedBuckets]] bounds the sum.
    */
  val DefaultMaxBucketSize: Int = 4096

  /** Single-node floor of the candidate-volume budget. The budget bounds
    * the candidate shuffle at O(maxCandidates) ROWS, but the binding
    * constraint is the VERIFICATION join, whose intermediate carries both
    * token arrays per candidate (~2 × avg array bytes per row — the
    * a-side join's output is the b-side join's shuffle input), so bytes
    * ≈ budget × array width: 10⁸ × ~300 B ≈ 30 GB, sized to fit a single
    * node's shuffle spill. Measured estimates (MinhashBreakdown
    * SPARK_GRAFT_BUCKETS): 3.9×10⁷ at 5×10⁵ docs on the saturating
    * sandbox corpus — this floor keeps the effective cap at
    * `maxBucketSize` (results byte-identical with or without the budget)
    * at every tested scale factor, and engages only in the fourth-decade
    * saturated regime.
    */
  val DefaultMaxCandidates: Long = 100_000_000L

  /** Sentinel default for `maxCandidates`: resolve the budget from the
    * session — [[MaxCandidatesConf]] if set, else the CLUSTER-AWARE
    * derivation in [[resolvedMaxCandidates]]. A node-sized constant is
    * the wrong default on a 1000-executor cluster (it would throttle the
    * candidate shuffle to one node's spill capacity); an explicit
    * argument always wins.
    */
  val AutoMaxCandidates: Long = -1L

  /** Session conf overriding the candidate-volume budget — the knob the
    * saturation error names.
    */
  val MaxCandidatesConf = "spark.graft.lsh.maxCandidates"

  /** Per-CORE slice of the derived budget, calibrated so the measured
    * 32-thread single-node budget is exactly the floor: 32 cores ×
    * 3.125M candidates × ~300 B of verification-join intermediate ≈ the
    * ~30 GB single-node spill budget [[DefaultMaxCandidates]] encodes —
    * ~0.94 GB of intermediate per concurrently-running task. Derived
    * from `defaultParallelism` (actual aggregate executor cores), NOT
    * `spark.sql.shuffle.partitions`: that knob's DEFAULT (200) states
    * nothing about capacity — an untuned single-node session would get
    * 12.5× its measured spill budget and the saturation fail-fast would
    * effectively never trip on exactly the deployments it protects
    * (r13 ADVICE). On a real cluster defaultParallelism is the
    * deployment's own statement of width (1000 executors × 8 cores →
    * 8000 → 2.5×10¹⁰ candidates ≈ 7.5 GB of spill per executor).
    */
  val PerCoreCandidates: Long = 3_125_000L

  /** Effective candidate budget: an explicit non-negative request wins;
    * otherwise `spark.graft.lsh.maxCandidates` if set; otherwise
    * max(DefaultMaxCandidates, defaultParallelism × PerCoreCandidates).
    */
  def resolvedMaxCandidates(s: SparkSession, requested: Long): Long =
    if (requested >= 0L) requested
    else s.conf.getOption(MaxCandidatesConf).map(_.trim.toLong).getOrElse {
      val cores = s.sparkContext.defaultParallelism.toLong
      math.max(DefaultMaxCandidates, cores * PerCoreCandidates)
    }

  /** Maximum-throughput variant on the xxhash64/murmur3 family (native
    * `minhash_signature` kernel) — same pipeline shape, NOT replayable by
    * an external SQL engine. Use when no cross-engine check is required.
    */
  def fastNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
                         threshold: Double = 0.35,
                         maxBucketSize: Int = DefaultMaxBucketSize,
                         maxCandidates: Long = AutoMaxCandidates): DataFrame = {
    import graft.functions.GraftFunctions.{minhash_signature, sorted_intersect_size}
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    // Same bounded-materialization shape as [[nearDuplicates]] (r14):
    // no corpus-sized cache anywhere — the self-join input semi-joins
    // to the collision-bucket set, verification re-tokenizes only
    // candidate-touched docs, and the minhash kernel runs twice as the
    // deliberate CPU-for-disk trade.
    val narrow = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val banded = narrow
      .repartition(col("id"))
      .select(col("id"),
        transform(split(lower(trim(col("txt"))), "\\s+"), x => xxhash64(x)).as("th"))
      .select(col("id"), minhash_signature(col("th"), shingleSize, numHashes).as("sig"))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), hash(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bsig"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))

    // Same try/finally cache lifecycle as [[nearDuplicates]] — no leaked
    // cached partitions on the fail-loud saturation path (r14 ADVICE).
    val cacheSigs = persistSignatures(narrow)
    val bandedIn = if (cacheSigs) banded.persist() else banded
    val (sized, dupCache) = boundedBuckets(bandedIn, maxBucketSize,
      resolvedMaxCandidates(docs.sparkSession, maxCandidates))
    var candidates: DataFrame = null
    var verif: DataFrame = null
    try {
      candidates = sized.as("x").join(sized.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
        .distinct()
        .persist()

      val candIds = candidates.select(col("a_id").as("id"))
        .union(candidates.select(col("b_id").as("id"))).distinct()
      verif = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
        .join(candIds, Seq("id"), "left_semi")
        .select(col("id"),
          array_sort(array_distinct(
            transform(split(lower(trim(col("txt"))), "\\s+"), x => xxhash64(x)))).as("toks"))
        .persist()

      val a = verif.select(col("id").as("a_id"), col("toks").as("a_toks"))
      val b = verif.select(col("id").as("b_id"), col("toks").as("b_toks"))
      candidates.join(a, "a_id").join(b, "b_id")
        .withColumn("inter", sorted_intersect_size(col("a_toks"), col("b_toks")).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .localCheckpoint() // eager: caches released in finally
    } finally {
      dupCache.unpersist(false)
      if (cacheSigs) bandedIn.unpersist(false)
      if (candidates != null) candidates.unpersist(false)
      if (verif != null) verif.unpersist(false)
    }
  }

  /** Back-compat alias: [[nearDuplicates]] with the bounded-slice default
    * parameters the oracle twin query has always used.
    */
  def oracleNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                           numHashes: Int = 32, bands: Int = 8,
                           threshold: Double = 0.5): DataFrame =
    nearDuplicates(docs, idCol, textCol, shingleSize = 3,
      numHashes = numHashes, bands = bands, threshold = threshold)

  // -------------------------------------------------------------- oracle SQL

  /** CTE definitions replaying [[nearDuplicates]] end to end in DuckDB
    * with the same A_j/B_j constants; the final relation is
    * `pairs(a_id, b_id, jaccard)`. `docWhere` filters the `documents`
    * scan ("" = whole table). Compose into a full query or feed the pair
    * graph into a recursive-CTE clustering fixpoint.
    */
  /** The CTE prefix up to per-doc band signatures (`bands(doc_id, band,
    * bsig)`) — the replayable core shared by the pair oracle and the
    * streaming LSH-index oracle.
    */
  def oracleBandsCtes(docWhere: String, numHashes: Int, bands: Int): String = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val p = OracleP
    val whereClause = if (docWhere.isEmpty) "" else s" WHERE $docWhere"
    val minCols = (0 until numHashes).map(j =>
      s"MIN((hm * ${oracleA(j)} + ${oracleB(j)}) % $p) AS m$j").mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => s"CAST(m${b * rows + r} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $parts)) AS bsig FROM m"
    }.mkString("\n  UNION ALL\n  ")
    s"""t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents$whereClause),
       |sh AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks) - 1),
       |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
       |    ELSE [concat_ws(' ', toks)] END) AS s
       |  FROM t),
       |h AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % $p AS hm
       |  FROM sh),
       |m AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  def oraclePairsCtes(docWhere: String, numHashes: Int, bands: Int,
                      threshold: Double,
                      maxBucketSize: Int = DefaultMaxBucketSize): String = {
    s"""${oracleBandsCtes(docWhere, numHashes, bands)},
       |bandsc AS (
       |  SELECT doc_id, band, bsig FROM (
       |    SELECT doc_id, band, bsig,
       |      COUNT(*) OVER (PARTITION BY band, bsig) AS bn FROM bands) v
       |  WHERE bn <= $maxBucketSize),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM bandsc x JOIN bandsc y
       |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
       |sets AS (SELECT doc_id, list_distinct(toks) AS ts FROM t),
       |pairs AS (
       |  SELECT a_id, b_id, jaccard FROM (
       |    SELECT a_id, b_id,
       |      CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE) /
       |        (len(sa.ts) + len(sb.ts) - CAST(len(list_intersect(sa.ts, sb.ts)) AS DOUBLE)) AS jaccard
       |    FROM cand JOIN sets sa ON a_id = sa.doc_id JOIN sets sb ON b_id = sb.doc_id) v
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  /** Full query replaying [[nearDuplicates]] over `documents` rows
    * matching `docWhere` ("" = all).
    */
  def nearDuplicatesOracleSql(docWhere: String, numHashes: Int = 64,
                              bands: Int = 16, threshold: Double = 0.35): String =
    s"""WITH ${oraclePairsCtes(docWhere, numHashes, bands, threshold)}
       |SELECT a_id, b_id, jaccard FROM pairs
       |ORDER BY a_id, b_id""".stripMargin

  /** DuckDB SQL replaying the bounded oracle twin (doc_id < maxDocId,
    * 32 hashes / 8 bands / 0.5 — the query's historical parameters).
    */
  def oracleNearDuplicatesSql(maxDocId: Int, numHashes: Int = 32, bands: Int = 8,
                              threshold: Double = 0.5): String =
    nearDuplicatesOracleSql(s"doc_id < $maxDocId", numHashes, bands, threshold)
}
