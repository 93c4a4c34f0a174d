package graft.kv

import graft.core.{ConditionalCheckFailedException, GraftException, RetentionFloorLostException}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Versioned, partitioned key-value table
  * (client/.../tables/KeyValueTable.java:119,
  * KeyValueTableConfiguration.java:39-55) re-expressed as an LSM over
  * parquet: every update batch commits one delta file per touched bucket
  * plus a manifest CAS; reads resolve base+deltas by latest commit version
  * per key; compaction rewrites the resolved state as a new base
  * (TableCompactor analog). Entry versions are commit versions — exactly
  * the reference's monotonic per-entry `Version` semantics.
  *
  * Scale: buckets = `hash(pk) % partitionCount` spread keys across
  * partitions; point reads prune to one bucket's files via parquet stats
  * on `bucket`/`pk`; the read amplification between compactions is
  * #deltas, bounded by the compaction cadence. No driver-side state.
  */
final case class KvFile(path: String, kind: String, commitVersion: Long)
/** A compacted-away file awaiting physical deletion after its
  * reader-grace deadline (see StreamCatalog.sweepDeletes rationale).
  */
final case class KvPendingDelete(path: String, notBefore: Long)
final case class KvManifest(name: String, partitionCount: Int, version: Long,
                            files: Seq[KvFile],
                            pendingDeletes: Seq[KvPendingDelete] = Nil,
                            /** Wall-clock stamped at commit (CAS) time —
                              * the TIMESTAMP AS OF authority, mirroring
                              * StreamMetadata.committedAt. 0 = pre-upgrade
                              * manifest (resolution falls back to mtime).
                              */
                            committedAt: Long = 0L,
                            /** Creation identity of this table INCARNATION
                              * (mirrors StreamMetadata.incarnation): a fresh
                              * UUID stamped by the v1 commit — the table's
                              * first after (re)creation, since chains
                              * restart at 1 — and force-carried by every
                              * later commit. GC stamps it into the floor
                              * chain, so a floor chain that survived a
                              * delete+recreate (hand surgery / partial
                              * delete) is auditable as STALE by comparing
                              * against the live chain's identity ("" =
                              * pre-upgrade manifest, exempt).
                              */
                            incarnation: String = "")

object KeyValueTable {
  /** Conditional batches up to this many touched keys are validated with
    * literal (bucket, pk) pushdown predicates; larger batches fall back
    * to a broadcast semi-join below the versioning window.
    */
  val ConditionPruneLimit: Int = 1024

  /** Per-table serialization of manifest GC within this JVM — work
    * deduplication, not a correctness lock (same rationale as
    * `StreamCatalog.gcLocks`): the floor marker is a CAS-appended chain
    * ([[graft.catalog.FloorChain]]), monotone across JVMs by
    * construction, so unserialized concurrent gcs can never regress it.
    */
  private[kv] val gcLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Cap on the probe-forward tip walk: each probe is one exists() GET,
    * so an instance whose hint is FAR behind (idle against a busy table)
    * must fall back to one LIST rather than pay a sequential round trip
    * per missed version. 32 probes ≈ a few LIST pages' worth of latency
    * — past that the listing wins.
    */
  val ProbeWalkCap: Int = 32

}

class KeyValueTable(spark: SparkSession, rootDir: String, val name: String,
                    val partitionCount: Int = 16,
                    deleteGraceMillis: Long = graft.catalog.StreamCatalog.DefaultDeleteGraceMillis,
                    hadoopConf: Configuration = new Configuration()) {
  import spark.implicits._
  private implicit val fmts: Formats = DefaultFormats

  private val tableDir = new Path(new Path(rootDir), name)
  private val metaDir = new Path(tableDir, "_meta")
  private def fs: FileSystem = tableDir.getFileSystem(hadoopConf)

  // ------------------------------------------------------------- manifest io

  private def manifestPath(v: Long) = new Path(metaDir, f"manifest-$v%012d.json")
  // the GC retention floor: a CAS-appended `floor-<seq>.json` chain
  // under _meta (names deliberately outside the `manifest-*` pattern,
  // invisible to the version listing) — see graft.catalog.FloorChain
  private val floorChain = new graft.catalog.FloorChain(() => fs, metaDir)

  private def listedVersions(): Seq[Long] =
    try fs.listStatus(metaDir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-") =>
        n.stripPrefix("manifest-").stripSuffix(".json").toLong }.toSeq
    catch { case _: FileNotFoundException => Seq.empty[Long] }

  /** Newest version this instance has SEEN — the probe-forward hint that
    * keeps warm reads and commits LIST-free (VersionsBench measured the
    * `_meta` listing at ~150 ms once a chain passes 10^4 versions, paid
    * by EVERY read and CAS round trip). Only a hint: a stale or retired
    * value falls back to the listing path, never to a wrong answer.
    */
  @volatile private var tipHint: Long = 0L

  private def latest(): KvManifest = {
    // Dense-chain fast path: probe exact keys forward from the hint — no
    // LIST. Sound because the chain is dense, exact-key reads are
    // read-after-write consistent on object stores, manifests are
    // SELF-CONTAINED (whatever version the probe lands on, reading it
    // yields exactly that version's full state — delete+recreate of the
    // same name can never mix incarnations), and a probe walk stopped at
    // a concurrent-GC hole lands below the floor marker (written before
    // any delete) — detected, falls back to the listing.
    val hint = tipHint
    if (hint > 0L && fs.exists(manifestPath(hint))) {
      // capped walk: a hint that is ProbeWalkCap+ versions behind falls
      // back to the listing (one LIST beats thousands of serial GETs;
      // the worst case otherwise inverts the warm-path optimization)
      val cap = hint + KeyValueTable.ProbeWalkCap
      var max = hint
      while (max < cap && fs.exists(manifestPath(max + 1))) max += 1
      // floorFast: one exists() miss when the floor chain hasn't
      // advanced — stale only after a cross-instance delete+recreate,
      // which the LIST-path fallback below resolves authoritatively
      if (max < cap && max >= floorChain.floorFast()) {
        val m = readManifest(max)
        tipHint = max
        return m
      }
    }
    val listed = listedVersions()
    // List-after-write-lag guard (same trick as StreamCatalog
    // .listVersions): the commit chain is dense from 1, so probe
    // exists() past the listed max — an object store's stale LIST can
    // never hide a committed manifest from the next reader/committer.
    val listedMax = if (listed.isEmpty) 0L else listed.max
    var max = listedMax
    while (fs.exists(manifestPath(max + 1))) max += 1
    // GC + list-lag double-blind (GcRaceSpec caught the stream twin
    // live): gcManifests retires [1, floor) and the probe walk above
    // dies at the first retired version — if the lag window also hides
    // every RETAINED manifest from the listing, max lands at 0 and the
    // table would silently read as EMPTY. The floor marker is the
    // recovery base (retained by contract: marker before deletes,
    // floors monotone across JVMs by CAS-append) — probe forward from
    // it; re-read the floor if a concurrent gc advanced it mid-probe
    // (strictly increasing, so the loop terminates; a floor chain
    // removed by deleteTable reads as 0 and falls through). The floor
    // is read UNCONDITIONALLY (one cheap chain read) and the recovery
    // skipped only when max already reached it: a probe-confirmed
    // manifest is NOT proof by itself — a concurrent gc can OVERTAKE
    // the walk (walk confirms v, gc retires v..floor-1, probe of v+1
    // misses), leaving max at a now-deleted version >= 1 below the
    // whole retained chain (r13 ADVICE; "deleted prefix" holds for a
    // snapshot, not a time-spanning walk).
    var fl = floorChain.read().floor
    var prevFl = -1L
    while (max < fl && fl != prevFl) {
      var n2 = fl
      while (fs.exists(manifestPath(n2))) { max = n2; n2 += 1 }
      prevFl = fl
      if (max < fl) fl = floorChain.read().floor
    }
    if (max < fl)
      throw new RetentionFloorLostException(
        s"kv $name: retention floor $fl names a retained chain but no " +
          s"manifest at or above it is readable (max found $max) — " +
          "concurrent delete or storage corruption")
    // empty table = version 0, so the FIRST commit is version 1: entry
    // versions stay strictly positive and can never collide with the
    // reserved expectedVersion=0 ("must not exist") sentinel
    if (max == 0L) KvManifest(name, partitionCount, 0L, Nil)
    else {
      val m = readManifest(max)
      tipHint = max
      m
    }
  }

  private def readManifest(v: Long): KvManifest = {
    val in = fs.open(manifestPath(v))
    try Serialization.read[KvManifest](
      new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
    finally in.close()
  }

  private def commit(m0: KvManifest, prevCommittedAt: Long): KvManifest = {
    // commit time stamped INSIDE the manifest at CAS time (file mtimes
    // are unreliable across stores) — the TIMESTAMP AS OF authority —
    // and CLAMPED to never precede the previous commit's stamp: the CAS
    // serializes commits, so the sequence is monotone by construction
    // even across skewed writer clocks, which is what lets versionAtTime
    // resolve by pure binary search (same contract as
    // StreamCatalog.writeManifest)
    // v1 = the incarnation's first commit: mint its identity here (the
    // CAS arbitrates racing first-committers, so exactly one identity
    // ever lands); every later commit carries the tip's forward
    val m = m0.copy(committedAt =
      math.max(System.currentTimeMillis(), prevCommittedAt),
      incarnation =
        if (m0.version == 1L) UUID.randomUUID().toString else m0.incarnation)
    fs.mkdirs(metaDir)
    val out = graft.catalog.CasFiles.createExclusive(fs, manifestPath(m.version)) // exclusive → CAS
    try out.write(Serialization.write(m).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // the committer's next read-modify-write probes forward from here
    tipHint = m.version
    m
  }

  // ------------------------------------------------------------------ write

  /** Apply a batch of modifications atomically. `ops` columns:
    * pk string, sk string, value binary, op string (PUT|REMOVE),
    * expectedVersion long (-1 = unconditional, 0 = must-not-exist i.e.
    * Insert, >0 = conditional Put/Remove on that exact version).
    * Returns the commit version. Condition failures raise
    * ConditionalCheckFailed before anything becomes visible
    * (BadKeyVersionException / table-segment conditional-update analog,
    * segmentstore/contracts/.../tables/TableStore.java:114-242).
    */
  def update(ops: DataFrame): Long = {
    var attempts = 0
    while (true) {
      val m = latest()
      val commitVersion = m.version + 1
      val keyed = ops.withColumn("bucket", pmod(xxhash64($"pk"), lit(partitionCount)))

      // conditional checks against the current resolved state of the
      // TOUCHED keys only: the touched (bucket, pk) set becomes literal
      // predicates on the raw file scan (conditional batches are small —
      // reference conditional updates are one wire-command batch), so
      // parquet bucket/pk stats prune untouched buckets instead of
      // resolving the whole table; oversized batches fall back to a
      // broadcast semi-join, still applied below the window.
      val conds = keyed.filter($"expectedVersion" >= 0)
      val condKeyRows = conds.select($"bucket", $"pk")
        .limit(KeyValueTable.ConditionPruneLimit + 1).collect()
      if (condKeyRows.nonEmpty) {
        val cur =
          if (condKeyRows.length <= KeyValueTable.ConditionPruneLimit) {
            val buckets = condKeyRows.map(_.getLong(0)).distinct.toSeq
            val pks = condKeyRows.map(_.getString(1)).distinct.toSeq
            resolved(m, raw => raw.filter($"bucket".isin(buckets: _*) && $"pk".isin(pks: _*)))
          } else
            resolved(m, raw => raw.join(
              broadcast(conds.select($"bucket", $"pk", $"sk").distinct()),
              Seq("bucket", "pk", "sk"), "left_semi"))
        val bad = conds.join(cur.select($"pk", $"sk", $"version"), Seq("pk", "sk"), "left")
          .filter(
            ($"expectedVersion" === 0 && $"version".isNotNull) ||
            ($"expectedVersion" > 0 && ($"version".isNull || $"version" =!= $"expectedVersion")))
          .limit(1).collect()
        if (bad.nonEmpty) {
          val r = bad.head
          throw new ConditionalCheckFailedException(
            s"kv $name: condition failed for pk=${r.getAs[String]("pk")} " +
            s"expected=${r.getAs[Long]("expectedVersion")} actual=${Option(r.get(r.fieldIndex("version"))).getOrElse("absent")}")
        }
      }

      val deltaDir = new Path(tableDir, s"delta-$commitVersion-${UUID.randomUUID()}")
      keyed
        .select($"bucket", $"pk", $"sk", $"value", $"op",
                lit(commitVersion).as("version"))
        // explicit count: one task per bucket (AQE would coalesce the
        // small shuffle to one task and serialize the sort+encode)
        .repartition(partitionCount, $"bucket")
        .sortWithinPartitions($"bucket", $"pk", $"sk")
        .write.parquet(deltaDir.toString)

      try {
        commit(m.copy(version = commitVersion,
          files = m.files :+ KvFile(deltaDir.toString, "delta", commitVersion)),
          m.committedAt)
        return commitVersion
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(deltaDir, true) // lost the race: re-check conditions on fresh state
          attempts += 1
          if (attempts > 10) throw new ConditionalCheckFailedException(s"kv $name: CAS lost $attempts times")
      }
    }
    -1L // unreachable
  }

  /** Insert: fail if the key already exists (client/.../tables/Insert.java). */
  def insert(entries: DataFrame): Long =
    update(entries.withColumn("op", lit("PUT")).withColumn("expectedVersion", lit(0L)))

  /** Unconditional Put (client/.../tables/Put.java). */
  def put(entries: DataFrame): Long =
    update(entries.withColumn("op", lit("PUT")).withColumn("expectedVersion", lit(-1L)))

  /** Conditional Put against an exact entry version. */
  def putIfVersion(entries: DataFrame, expectedVersion: Long): Long =
    update(entries.withColumn("op", lit("PUT"))
      .withColumn("expectedVersion", lit(expectedVersion)))

  /** Remove keys; `df` needs pk + sk. (client/.../tables/Remove.java). */
  def remove(keys: DataFrame): Long =
    update(keys.withColumn("value", lit(null).cast("binary"))
      .withColumn("op", lit("REMOVE")).withColumn("expectedVersion", lit(-1L)))

  // ------------------------------------------------------------------- read

  /** Latest live entries (pk, sk, value, version). */
  def entries(): DataFrame = resolved(latest())

  /** Latest-version resolution. `prune` is applied to the RAW file scan,
    * BELOW the versioning window — sound for any filter that keeps or
    * drops whole (bucket, pk, sk) groups (the window's partitioning), and
    * it is what lets literal key predicates reach the parquet stats.
    */
  private def resolved(m: KvManifest, prune: DataFrame => DataFrame = identity): DataFrame = {
    if (m.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "bucket BIGINT, pk STRING, sk STRING, value BINARY, version BIGINT"))
    val raw = prune(spark.read.parquet(m.files.map(_.path): _*))
    val w = Window.partitionBy($"bucket", $"pk", $"sk").orderBy($"version".desc)
    raw.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" === "PUT")
      .select($"bucket", $"pk", $"sk", $"value", $"version")
  }

  /** Scala-side replica of the write path's `pmod(xxhash64(pk), n)`
    * bucketing — lets point reads turn a key into its bucket WITHOUT a
    * Spark job, so the bucket becomes a literal pushdown predicate.
    */
  private def bucketOf(pk: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(pk),
      org.apache.spark.sql.types.StringType, 42L)
    ((h % partitionCount) + partitionCount) % partitionCount
  }

  /** Batched multiget (KeyValueTable.java:181 getAll): resolve ONLY the
    * requested keys — literal (bucket, pk) predicates on the raw scan
    * prune every untouched bucket's files via parquet stats before the
    * versioning window runs. Returns (pk, sk, value, version) for keys
    * that exist.
    */
  def getAll(keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "getAll needs at least one key")
    val buckets = keys.map(k => bucketOf(k._1)).distinct
    val pks = keys.map(_._1).distinct
    val exact = keys.map { case (p, s) => $"pk" === p && $"sk" === s }.reduce(_ || _)
    resolved(latest(), raw =>
      raw.filter($"bucket".isin(buckets: _*) && $"pk".isin(pks: _*)).filter(exact))
      .select($"pk", $"sk", $"value", $"version")
  }

  /** Point lookup (KeyValueTable.java:181 get): one bucket's files via
    * the same pruned path as [[getAll]].
    */
  def get(pk: String, sk: String = ""): Option[(Array[Byte], Long)] = {
    val rows = getAll(Seq((pk, sk))).select($"value", $"version").collect()
    rows.headOption.map(r => (r.getAs[Array[Byte]]("value"), r.getAs[Long]("version")))
  }

  def exists(pk: String, sk: String = ""): Boolean = get(pk, sk).isDefined

  /** Sorted prefix iteration (KeyValueTableIterator.java:64 forPrefix). */
  def scanPrefix(prefix: String): DataFrame =
    entries().filter($"pk".startsWith(prefix)).orderBy($"pk", $"sk")

  /** Sorted range iteration [fromPk, toPk) (KeyValueTableIterator.java:123). */
  def scanRange(fromPk: String, toPk: String): DataFrame =
    entries().filter($"pk" >= fromPk && $"pk" < toPk).orderBy($"pk", $"sk")

  /** One page of sorted iteration — the `maxIterationSize` paging of
    * KeyValueTableIterator.java:64,123. KEYSET pagination: the page holds
    * the first `pageSize` entries with (pk, sk) strictly after
    * `afterKey`; the caller passes the last row back as the continuation
    * token. Each page is an independent bounded query (limit → TakeOrdered,
    * no global sort, no offset skip-scan), so paging cost does not grow
    * with position — the Spark shape of the reference's
    * continuation-token iterator.
    */
  def scanPage(fromPk: String, toPk: String, pageSize: Int,
               afterKey: Option[(String, String)] = None): DataFrame = {
    require(pageSize > 0, "pageSize must be positive")
    val base = entries().filter($"pk" >= fromPk && $"pk" < toPk)
    val paged = afterKey match {
      case Some((apk, ask)) =>
        base.filter($"pk" > apk || ($"pk" === apk && $"sk" > ask))
      case None => base
    }
    paged.orderBy($"pk", $"sk").limit(pageSize)
  }

  /** Paged prefix iteration (forPrefix + maxIterationSize). */
  def scanPrefixPage(prefix: String, pageSize: Int,
                     afterKey: Option[(String, String)] = None): DataFrame = {
    require(pageSize > 0, "pageSize must be positive")
    val base = entries().filter($"pk".startsWith(prefix))
    val paged = afterKey match {
      case Some((apk, ask)) =>
        base.filter($"pk" > apk || ($"pk" === apk && $"sk" > ask))
      case None => base
    }
    paged.orderBy($"pk", $"sk").limit(pageSize)
  }

  /** Changes since a commit version — the ReadTableEntriesDelta analog
    * (WireCommands.java:2718): every PUT/REMOVE with version > from.
    */
  def deltaSince(fromVersion: Long): DataFrame = {
    val m = latest()
    val files = m.files.filter(_.commitVersion > fromVersion).map(_.path)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "bucket BIGINT, pk STRING, sk STRING, value BINARY, op STRING, version BIGINT"))
    else spark.read.parquet(files: _*).filter($"version" > fromVersion)
      .select($"bucket", $"pk", $"sk", $"value", $"op", $"version")
  }

  def currentVersion: Long = latest().version

  /** The GC retention floor: manifest versions below it are retired.
    * 0 = never GC'd.
    */
  def manifestFloor: Long = floorChain.read().floor

  /** This table incarnation's creation identity (minted by the v1
    * commit, carried by every commit after it; "" before the first
    * commit and on pre-upgrade chains). See [[KvManifest.incarnation]].
    */
  def incarnation: String = latest().incarnation

  /** (chain seq, floor record) — the `kv_describe_retention` surface. */
  def floorWithSeq: (Long, graft.catalog.ManifestFloor) = floorChain.readWithSeq()

  /** Exact-key probe of the floor chain's permanent anchor (false on a
    * never-GC'd table).
    */
  def floorAnchorPresent: Boolean = floorChain.anchorPresent()

  /** Retire manifest history older than `keepVersions` behind the tip —
    * the KVT side of manifest-log retention (the chain otherwise grows
    * one file per commit forever). KV manifests are SELF-CONTAINED full
    * state, so unlike the stream log no checkpoint base is needed: any
    * retained version reconstructs alone. The floor marker commits
    * first (crash-safe: a floor claiming more than was deleted only
    * skips some lag probes), then manifests strictly below it are
    * deleted. As-of reads (`entriesAt`, SQL `VERSION AS OF`) below the
    * floor fail loudly at resolution; `deltaSince` and live reads only
    * ever read the LATEST manifest and are unaffected. Returns the
    * retired versions.
    */
  def gcManifests(keepVersions: Int): Seq[Long] = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val lock = KeyValueTable.gcLocks.computeIfAbsent(
      tableDir.toString, _ => new Object)
    lock.synchronized { gcManifestsLocked(keepVersions) }
  }

  private def gcManifestsLocked(keepVersions: Int): Seq[Long] = {
    val m = latest()
    val cut = m.version - keepVersions
    if (cut <= 0 || cut <= manifestFloor) return Nil
    // the marker CAS: floors are monotone across JVMs by construction
    // (FloorChain appends through exclusive-create), so a slower gc
    // racing a larger-cut gc can never regress the floor — the loser
    // discovers supersession atomically and leaves the deletes to the
    // winner (whose retired range covers ours). The record carries the
    // table's incarnation identity (symmetric with the stream side's v0
    // stamp) so a chain surviving a delete+recreate audits as stale.
    if (!floorChain.advance(cut, m.incarnation)) return Nil
    // ASCENDING delete order: a crashed/overtaken sweep always leaves a
    // deleted PREFIX of [1, floor), which is what lets fsck classify a
    // partially-swept chain as benign retention (not corruption) and
    // keeps the probe walks' miss-at-first-hole geometry predictable.
    val retired = listedVersions().filter(v => v >= 1 && v < cut).sorted
    retired.foreach { v =>
      try fs.delete(manifestPath(v), false)
      catch { case _: Exception => () } // idempotent: a re-run finishes
    }
    retired
  }

  /** Snapshot (time-travel) read: the table as of commit `version`.
    * Every commit writes an immutable `manifest-v` (the same history the
    * delta feed walks), so an as-of read is just latest-version resolution
    * over THAT manifest's file list — no version predicate on the scan,
    * and key-literal pruning composes exactly as on [[entries]]. Commits
    * after `version` (including compactions, which only fold files visible
    * at their own commit) are invisible by construction.
    *
    * Horizon: a compaction tombstones the files it replaced with a
    * reader-grace deadline and [[sweepDeletes]] reclaims them after it —
    * so snapshots remain readable for at least the grace period, and a
    * snapshot older than the last sweep may reference deleted files
    * (the standard retention-bounded time-travel contract).
    */
  def entriesAt(version: Long): DataFrame = resolved(manifestAt(Some(version)))

  /** Latest commit version stamped at or before `epochMillis` — the
    * `TIMESTAMP AS OF` resolution surface, mirroring
    * `StreamCatalog.versionAtTime`: the answer is max{v : stamp(v) <= t}
    * (ascending-scan-keep-last semantics — clock skew between racing
    * committers can never smuggle post-t commits in), mtime fallback for
    * pre-upgrade manifests. None if the table had no commit yet at t;
    * throws [[graft.core.TruncatedDataException]] when the instant falls
    * inside GC-retired history (floor > 0 and nothing retained
    * qualifies) — the retention contract fails loudly instead of
    * guessing.
    *
    * Cost: commit stamps are MONOTONE by construction (every CAS clamps
    * the stamp to at least the previous commit's — see [[commit]]), so
    * resolution is a pure binary search over the RETAINED range
    * [max(1,floor), tip]: O(log n) manifest GETs, and retired versions
    * are never probed at all (the old linear scan paid one exists miss
    * plus an exception per retired version). A short backward
    * verify-walk absorbs local inversions in pre-clamp history; on
    * clamped chains it never takes a step.
    */
  def versionAtTime(epochMillis: Long): Option[Long] = {
    val floor = manifestFloor
    val tip = latest().version
    val lo0 = math.max(1L, floor)
    def gated(best: Option[Long]): Option[Long] = {
      if (best.isEmpty && floor > 0L)
        throw new graft.core.TruncatedDataException(
          s"kv table $name history at ${java.time.Instant.ofEpochMilli(epochMillis)} " +
            s"was garbage-collected (manifest retention floor is version $floor)")
      best
    }
    if (tip < lo0) return gated(None)
    def stampOf(v: Long): Long = {
      def once(): Long = {
        val m = readManifest(v)
        if (m.committedAt != 0L) m.committedAt
        else fs.getFileStatus(manifestPath(v)).getModificationTime
      }
      // torn read at the chain tip (CAS winner mid-write) = "not
      // committed yet": +∞ keeps the bisection sound; a missing file
      // (concurrent gc) propagates for the linear fallback
      for (_ <- 1 to 3) {
        try return once()
        catch {
          case e: java.io.FileNotFoundException => throw e
          case _: Exception => Thread.sleep(5)
        }
      }
      Long.MaxValue
    }
    def linear(): Option[Long] = {
      var best: Option[Long] = None
      for (v <- lo0 to tip) {
        try if (stampOf(v) <= epochMillis) best = Some(v)
        catch { case _: Exception => } // concurrently removed: skip
      }
      gated(best)
    }
    try {
      var lo = lo0
      var hi = tip + 1 // first version with stamp > t, or tip+1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (stampOf(mid) > epochMillis) hi = mid else lo = mid + 1
      }
      var v = lo - 1
      while (v >= lo0 && stampOf(v) > epochMillis) v -= 1
      gated(if (v < lo0) None else Some(v))
    } catch {
      // concurrent GC (floor moved) or drop mid-search: one linear pass
      // over what remains keeps the old skip-on-missing semantics
      case _: FileNotFoundException => linear()
    }
  }

  /** The committed manifest at `version` (None = latest) — the planning
    * surface for the SQL read path (`sources.GraftKvTable`), which needs
    * FILE LISTS, not DataFrames, to build its own co-located partitions.
    */
  private[graft] def manifestAt(version: Option[Long]): KvManifest = version match {
    case None => latest()
    case Some(v) if v <= 0L => KvManifest(name, partitionCount, 0L, Nil)
    case Some(v) =>
      val p = manifestPath(v)
      if (!fs.exists(p))
        // deliberately no latest() in the message: resolving the tip
        // costs a probe walk/LIST, and error paths (e.g. probing retired
        // versions) must stay O(1) — the floor covers the common cause
        throw new IllegalArgumentException(
          s"kv table $name has no commit $v" +
            (if (manifestFloor > 0L) s" (versions below ${manifestFloor} are GC-retired)" else ""))
      val in = fs.open(p)
      try Serialization.read[KvManifest](
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      finally in.close()
  }

  /** Integrity audit of this table's own storage (the KVT counterpart
    * of `tools.Fsck`'s stream checks — O(metadata), no data scan):
    * manifest chain complete (history for the delta feed and as-of
    * reads, bounded by the compaction horizon for data files), every
    * LIVE file present, and directory-parquet files that are neither
    * live nor pending-delete flagged as orphans (a crashed writer's
    * leak — harmless to reads, reclaimable). Returns human-readable
    * issue lines; empty = clean.
    */
  private[kv] def tableDirPath: String = tableDir.toString
  private[kv] def liveFilePaths: Seq[String] = latest().files.map(_.path)

  def fsck(): Seq[String] = {
    val issues = Seq.newBuilder[String]
    // a floor naming an unreachable retained chain throws loudly in
    // latest() (never a silent empty-table answer) — fsck's job is to
    // REPORT that state, not crash on it. Only the DEDICATED type is
    // classified: any other failure from latest() is not a floor issue
    // and must propagate as itself, not masquerade as one.
    val m =
      try latest()
      catch {
        case e: RetentionFloorLostException =>
          return Seq(s"gc-floor-base: ${e.getMessage}")
      }
    // versions below the GC floor are retired by contract, not holes.
    // A REGRESSED marker (legacy rename-replace surgery; unreachable
    // through the FloorChain CAS) reads as holes spanning exactly
    // [floor, X) with the chain from X intact — a healthy store with a
    // stale marker, self-healing because floors only move up: one
    // benign advisory, not chain-corruption spam (mirrors the stream
    // side's Fsck classification).
    val floor = manifestFloor
    val missing = (math.max(1L, floor) to m.version)
      .filterNot(v => fs.exists(manifestPath(v)))
    val regressedBase: Option[Long] =
      if (floor <= 0L || missing.isEmpty) None
      else {
        val x = missing.max + 1
        val contiguousFromFloor =
          missing.head == floor && missing.sameElements(floor until x) &&
            x <= m.version
        // KV manifests are self-contained: X parsing IS the base check
        if (contiguousFromFloor &&
            (try { readManifest(x); true } catch { case _: Exception => false }))
          Some(x)
        else None
      }
    regressedBase match {
      case Some(x) =>
        issues += (s"gc-floor-regressed: floor marker at v$floor but " +
          s"versions $floor..${x - 1} are already retired; retained " +
          "chain from v" + x + " is intact — benign stale marker, " +
          "self-heals on the next gc pass")
      case None =>
        missing.foreach(v =>
          issues += s"manifest-chain: missing version $v of ${m.version}")
    }
    // gc-floor-anchor-lost: suffix floor records listable while the
    // PERMANENT anchor (floor-1, never pruned) misses its exact-key
    // read — unreachable through the chain's own protocol, so hand
    // surgery or storage corruption. A fully lag-blinded cold reader in
    // this state would read floor 0 and lose the gc × list-lag recovery
    // base; the chain's cold read now recovers a positive floor from
    // the listed suffix, and THIS is where the state gets reported.
    if (floorChain.anchorLost())
      issues += ("gc-floor-anchor-lost: floor chain records exist but " +
        "the permanent floor-1 anchor misses its exact-key read — hand " +
        "surgery or storage corruption; a fully list-lag-blinded cold " +
        "reader would otherwise conclude the table was never GC'd")
    // gc-floor-stale-incarnation: the floor chain names a DIFFERENT
    // table incarnation than the live manifest chain — a chain that
    // survived a delete+recreate (its floor constrains versions of a
    // dead chain; the new chain's versions collide numerically). ""
    // on either side = pre-upgrade records, exempt.
    locally {
      val fc = floorChain.read()
      if (fc.floor > 0L && fc.incarnation.nonEmpty && m.incarnation.nonEmpty &&
          fc.incarnation != m.incarnation)
        issues += (s"gc-floor-stale-incarnation: floor chain stamped by " +
          s"incarnation ${fc.incarnation} but the live chain is " +
          s"${m.incarnation} — floor survived a delete+recreate; delete " +
          "the floor-*.json records (next gc re-establishes the floor)")
    }
    m.files.foreach { f =>
      if (!fs.exists(new Path(f.path)))
        issues += s"file-missing: live ${f.kind} file ${f.path} (commit ${f.commitVersion})"
    }
    orphanDirs(m).foreach(s =>
      issues += s"orphan-dir: ${s.getPath} (unreferenced; crashed writer leak)")
    issues.result()
  }

  /** Delta-/base- dirs referenced by neither the live manifest nor its
    * pending deletes — the single enumeration `fsck` reports from and
    * `sweepOrphans` reclaims from, so the two can never drift apart.
    * Manifests hold paths as written (often scheme-less); listStatus
    * returns fully-qualified URIs — compare on the scheme-less path.
    */
  private def orphanDirs(m: KvManifest): Seq[org.apache.hadoop.fs.FileStatus] = {
    def norm(p: String) = new Path(p).toUri.getPath
    val referenced = (m.files.map(_.path) ++ m.pendingDeletes.map(_.path))
      .map(norm).toSet
    try fs.listStatus(tableDir)
      .filter(s => s.isDirectory && (s.getPath.getName.startsWith("delta-") ||
        s.getPath.getName.startsWith("base-")))
      .filterNot(s => referenced.contains(norm(s.getPath.toString)))
      .toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  // -------------------------------------------------------------- compaction

  /** Fold all deltas into a fresh base (TableCompactor/HashTableCompactor
    * analog): one partition-parallel rewrite, old files leave the manifest
    * atomically and are deleted best-effort.
    */
  def compact(): Unit = {
    // reclaim past-grace tombstones from EARLIER compactions first —
    // compaction is the only producer of pending deletes, so sweeping on
    // its cadence bounds the dead-file backlog without a separate daemon
    sweepDeletes()
    val m = latest()
    if (m.files.isEmpty) return
    val baseDir = new Path(tableDir, s"base-${m.version}-${UUID.randomUUID()}")
    resolved(m)
      .withColumn("op", lit("PUT"))
      .select($"bucket", $"pk", $"sk", $"value", $"op", $"version")
      .repartition(partitionCount, $"bucket")
      .sortWithinPartitions($"bucket", $"pk", $"sk")
      .write.parquet(baseDir.toString)
    try {
      // replaced files become tombstones with a reader-grace deadline —
      // an in-flight read planned from the old manifest can finish;
      // sweepDeletes() reclaims them afterwards
      val deadline = System.currentTimeMillis() + deleteGraceMillis
      commit(KvManifest(name, partitionCount, m.version + 1,
        Seq(KvFile(baseDir.toString, "base", m.version)),
        m.pendingDeletes ++ m.files.map(f => KvPendingDelete(f.path, deadline)),
        incarnation = m.incarnation),
        m.committedAt)
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(baseDir, true)
        throw new GraftException(s"kv $name: compaction lost CAS; rerun")
    }
  }

  /** Physically delete past-deadline tombstones and clear them from the
    * manifest (delete-then-clear: idempotent across crashes).
    */
  def sweepDeletes(): Seq[String] = {
    val now = System.currentTimeMillis()
    val m = latest()
    val due = m.pendingDeletes.filter(_.notBefore <= now)
    if (due.isEmpty) return Nil
    // only paths whose delete actually succeeded count as done — a
    // failed delete keeps its tombstone so the next sweep retries it
    // (reporting it reclaimed would leak the file forever)
    val donePaths = due.map(_.path)
      .filter(p => scala.util.Try(fs.delete(new Path(p), true)).getOrElse(false))
      .toSet
    try commit(m.copy(version = m.version + 1,
      pendingDeletes = m.pendingDeletes.filterNot(p => donePaths.contains(p.path))),
      m.committedAt)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException | _: java.nio.file.FileAlreadyExistsException =>
        () // lost the CAS: files are gone, tombstones clear on a later sweep
    }
    donePaths.toSeq.sorted
  }

  /** Reclaim crashed-writer leaks: delta-/base- dirs referenced by
    * neither the live manifest nor its pending deletes (the orphans
    * `fsck()` reports). `graceMillis` shields an IN-FLIGHT writer that
    * has written its delta but not yet won the manifest CAS — deploy
    * with grace > the longest write (mirrors the stream side's
    * `GraftStreams.sweepOrphans` contract); a writer that LOSES the CAS
    * deletes its own dir, so only crashes leak. Returns reclaimed paths.
    */
  def sweepOrphans(graceMillis: Long = 3600000L): Seq[String] = {
    val cutoff = System.currentTimeMillis() - graceMillis
    val victims = orphanDirs(latest())
      .filter(_.getModificationTime <= cutoff)
      .map(_.getPath)
    // report only what was actually reclaimed — a failed delete stays an
    // orphan and fsck re-flags it next run, so claiming it swept would
    // make the admin output lie
    victims.filter(p => scala.util.Try(fs.delete(p, true)).getOrElse(false))
      .map(_.toString).sorted
  }
}
