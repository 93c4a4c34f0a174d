package graft.tools

import graft.catalog.StreamCatalog
import graft.core.StreamMetadata
import org.apache.hadoop.fs.Path

/** Engine fsck — the offline integrity audit an operator runs before
  * trusting a root after an incident (the moral analog of the
  * segment-store's startup recovery walk): every check reads only
  * manifests + file statuses, no data scan, so it is O(metadata) at any
  * corpus size.
  *
  * Checks per stream:
  *  - manifest chain: versions 1..current all present (the delta feed
  *    and as-of reads walk this history);
  *  - file existence: every live `FileEntry` resolves on the store, and
  *    its on-disk length matches the manifest-recorded `byteSize`
  *    (0 = pre-size manifest, skipped);
  *  - offset geometry: per segment, live files tile
  *    [max(head, startOffset), tailOffset) contiguously — no gap, no
  *    overlap (offsets below the truncation head are legitimately gone);
  *  - segment geometry: open segments' key ranges tile [0, 1).
  *
  * KV tables: latest manifest parses and every live file exists.
  *
  * Usage: runMain graft.tools.Fsck <rootDir> [scope]
  * Exit 0 = clean; 1 = issues (one line each: scope/stream kind detail).
  */
object Fsck {

  final case class Issue(where: String, kind: String, detail: String)

  def checkStream(cat: StreamCatalog, meta: StreamMetadata,
                  conf: org.apache.hadoop.conf.Configuration,
                  floorOverride: Option[Long] = None): Seq[Issue] = {
    val where = s"${meta.scope}/${meta.name}"
    val issues = Seq.newBuilder[Issue]

    // manifest history (delta feed / as-of read dependency); versions in
    // (0, floor) are GC-retired by contract, not holes. A caller that
    // already classified a REGRESSED marker (checkRoot) passes the
    // effective retained base so the same benign holes are not
    // re-reported as chain corruption here.
    val versions = cat.manifestVersions(meta.scope, meta.name).toSet
    val floor = floorOverride.getOrElse(cat.manifestFloor(meta.scope, meta.name))
    (1L to meta.version).filterNot(versions.contains).filter(_ >= floor).foreach(v =>
      issues += Issue(where, "manifest-chain", s"missing manifest version $v"))

    // file existence + recorded sizes
    val fs = new Path(meta.files.headOption.map(_.path).getOrElse("/")).getFileSystem(conf)
    meta.files.foreach { f =>
      val p = new Path(f.path)
      try {
        val st = fs.getFileStatus(p)
        if (f.byteSize > 0L && st.getLen != f.byteSize)
          issues += Issue(where, "file-size",
            s"${f.path}: manifest says ${f.byteSize} B, store has ${st.getLen} B")
      } catch {
        case _: java.io.FileNotFoundException =>
          issues += Issue(where, "file-missing", f.path)
      }
    }

    // per-segment offset tiling above the truncation head
    meta.files.groupBy(_.segmentId).foreach { case (sid, files) =>
      meta.segments.find(_.segmentId == sid) match {
        case None =>
          issues += Issue(where, "orphan-files", s"files reference unknown segment $sid")
        case Some(seg) =>
          val head = math.max(meta.headCut.getOrElse(sid, seg.startOffset), seg.startOffset)
          val sorted = files.sortBy(_.startOffset)
          // a truncation head may slice INSIDE the first live file (the
          // straddler stays; reads clamp) — a gap only exists if the
          // first live file starts ABOVE the head
          if (sorted.head.startOffset > head)
            issues += Issue(where, "offset-gap",
              s"segment $sid: head at $head but first live file starts at ${sorted.head.startOffset}")
          var pos = sorted.head.startOffset
          sorted.foreach { f =>
            if (f.startOffset != pos)
              issues += Issue(where, "offset-gap",
                s"segment $sid: expected offset $pos, file ${f.path} starts at ${f.startOffset}")
            pos = math.max(pos, f.endOffset)
          }
          if (pos != seg.tailOffset)
            issues += Issue(where, "tail-mismatch",
              s"segment $sid: files end at $pos, manifest tail is ${seg.tailOffset}")
      }
    }

    // segments claiming rows but owning no files at all (the groupBy
    // above only visits segments WITH files)
    val withFiles = meta.files.map(_.segmentId).toSet
    meta.segments.filterNot(s => withFiles(s.segmentId)).foreach { seg =>
      val head = math.max(meta.headCut.getOrElse(seg.segmentId, seg.startOffset), seg.startOffset)
      if (seg.tailOffset > head)
        issues += Issue(where, "tail-mismatch",
          s"segment ${seg.segmentId}: tail ${seg.tailOffset} above head $head with no live files")
    }

    // orphan data dirs: a batch/compaction/sink-epoch dir none of whose
    // files made it into the live manifest (or its pending-delete
    // tombstones) is a crashed writer's leak — invisible to readers
    // (plans come from the manifest, never listings), reclaimable.
    // Manifest paths may be scheme-less while listings are qualified —
    // compare scheme-less.
    def norm(p: String) = new Path(p).toUri.getPath
    val referencedPrefixes = (meta.files.map(_.path) ++
      meta.pendingDeletes.map(_.path)).map(norm)
    // The data dir comes from the catalog, not from file-path surgery, so
    // a fully-truncated/retention-swept stream (zero live files) still
    // gets its crashed-writer leaks scanned.
    locally {
      val dataDir = cat.dataDir(meta.scope, meta.name)
      val dfs = dataDir.getFileSystem(conf)
      try dfs.listStatus(dataDir)
        .filter(s => s.isDirectory && {
          val n = s.getPath.getName
          n.startsWith("batch-") || n.startsWith("compact-") ||
            n.startsWith("sinkstage-") || n.startsWith("txncommit-")
        })
        .map(_.getPath.toString)
        .filterNot(d => referencedPrefixes.exists(_.startsWith(norm(d) + "/")))
        .foreach(d => issues += Issue(where, "orphan-data",
          s"$d holds no manifest-referenced files (crashed writer leak; reclaimable)"))
      catch { case _: java.io.FileNotFoundException => }
    }

    // stuck transactions: an OPEN txn past its lease should have been
    // swept (Maintenance runs the sweep); a COMMITTING txn is mid-commit
    // and only a re-driven commit can finish it — both advisory
    val now = System.currentTimeMillis()
    meta.transactions.values.foreach { t =>
      if (t.expired(now))
        issues += Issue(where, "txn-lease-expired",
          s"open txn ${t.id} expired ${now - t.createdAt - t.leaseMillis} ms ago (run Maintenance)")
      else if (t.state == graft.core.TxnState.Committing)
        issues += Issue(where, "txn-stuck-committing",
          s"txn ${t.id} mid-commit (re-drive commitTxn)")
    }

    // open segments tile [0, 1)
    val open = meta.segments.filter(!_.isSealed).sortBy(_.keyLow)
    if (open.nonEmpty) {
      if (open.head.keyLow != 0.0 || open.last.keyHigh != 1.0 ||
          open.sliding(2).exists {
            case Seq(a, b) => a.keyHigh != b.keyLow
            case _         => false
          })
        issues += Issue(where, "key-range-gap",
          open.map(s => f"[${s.keyLow}%.4f,${s.keyHigh}%.4f)").mkString(" "))
    } else if (!meta.isSealed)
      issues += Issue(where, "no-open-segments", "unsealed stream with no open segments")

    issues.result()
  }

  def checkRoot(rootDir: String, onlyScope: Option[String] = None,
                hadoopConf: Option[org.apache.hadoop.conf.Configuration] = None): Seq[Issue] = {
    // an explicit conf wins (embedded use against a store the session
    // doesn't know); else the active session's Hadoop conf (credentials,
    // custom fs.* impls); a bare Configuration otherwise (CLI use)
    val conf = hadoopConf.orElse(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf()))
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val cat = new StreamCatalog(rootDir, conf)
    val scopes = onlyScope.map(Seq(_)).getOrElse(cat.listScopes())
    scopes.flatMap { scope =>
      val streamIssues = cat.listStreams(scope).flatMap { st =>
        // chain density from the version listing, independent of state
        // reconstruction: with the incremental manifest log a mid-chain
        // hole makes getStream fail loudly
        // (ManifestChainBrokenException) rather than reconstruct, so the
        // chain report must not depend on it. manifestVersions is the
        // LAG-COMPENSATED listing (every hole from 0 to max confirmed by
        // a direct exists() probe), so an object-store listing that
        // surfaces a newer manifest before an older one never reads as
        // corruption here
        // a floor naming an unreachable retained chain throws loudly in
        // listVersions (never a silent empty answer) — fsck's job is to
        // REPORT that state, so catch and classify it here
        val listed =
          try cat.manifestVersions(scope, st)
          catch { case _: graft.core.ManifestChainBrokenException => Seq.empty[Long] }
        // versions in (0, floor) are GC-retired by contract, not holes;
        // the floor itself must still carry its base (v0 + the retained
        // chain reconstruct everything at or above it)
        val floor = cat.manifestFloor(scope, st)
        val holes =
          if (listed.isEmpty) Seq.empty[Long]
          else (0L to listed.max).filterNot(listed.toSet)
            .filter(v => v == 0L || v >= floor)
        // gc-floor-regressed: the marker sits BELOW already-retired
        // history — the holes are exactly the contiguous range
        // [floor, X) for a retained X that reconstructs, with the chain
        // above X intact. That is a healthy store with a stale marker
        // (self-healing: floors only move up, the next gc pass rewrites
        // it), not corruption — one advisory line instead of N
        // chain-corruption pages. Reachable only through legacy
        // rename-replaced markers or hand surgery: the FloorChain CAS
        // makes a live regression impossible going forward.
        val regressedBase: Option[Long] =
          if (floor <= 0L || holes.isEmpty || holes.head == 0L) None
          else {
            val x = holes.max + 1
            val contiguousFromFloor =
              holes.head == floor && holes.sameElements(floor until x)
            val baseOk = contiguousFromFloor && x <= listed.max &&
              (try { cat.getStreamAt(scope, st, x); true }
               catch { case _: Exception => false })
            if (baseOk) Some(x) else None
          }
        val chainIssues = regressedBase match {
          case Some(x) => Seq(Issue(s"$scope/$st", "gc-floor-regressed",
            s"floor marker at v$floor but versions $floor..${x - 1} are " +
              s"already retired; retained chain from v$x is intact — " +
              "benign stale marker, self-heals on the next gc pass"))
          case None => holes.map(v =>
            Issue(s"$scope/$st", "manifest-chain", s"missing manifest version $v"))
        }
        // a GC'd stream's oldest retained versions reconstruct from the
        // floor's checkpoint sidecar — if that base was lost after GC,
        // they are unreadable: corruption, not retention. In the
        // regressed state the effective base is X (already verified).
        val floorIssues =
          if (floor <= 0L || regressedBase.isDefined) Seq.empty
          else try { cat.getStreamAt(scope, st, floor); Seq.empty[Issue] }
          catch {
            case e: Exception => Seq(Issue(s"$scope/$st", "gc-floor-base",
              s"floor v$floor does not reconstruct (checkpoint base lost after gc): $e"))
          }
        // gc-floor-anchor-lost: suffix floor-chain records listable while
        // the PERMANENT floor-1 anchor misses its exact-key read —
        // unreachable through the chain's own protocol (prune never
        // touches seq 1), so hand surgery or storage corruption. A fully
        // list-lag-blinded cold reader in this state would conclude
        // "never GC'd" (floor 0) and lose the gc × list-lag recovery
        // base; FloorChain's cold read now recovers a positive floor
        // from the listed suffix — this is where the state is REPORTED.
        val anchorIssues =
          if (cat.floorAnchorLost(scope, st))
            Seq(Issue(s"$scope/$st", "gc-floor-anchor-lost",
              "floor chain records exist but the permanent floor-1 anchor " +
                "misses its exact-key read — hand surgery or storage " +
                "corruption; a fully list-lag-blinded cold reader would " +
                "otherwise conclude the stream was never GC'd"))
          else Seq.empty
        // gc-floor-stale-incarnation: the floor chain was stamped by a
        // DIFFERENT stream incarnation than the live chain — it survived
        // a delete+recreate and constrains a dead chain's version space.
        val staleIncIssues =
          (try {
            val fr = cat.manifestFloorRecord(scope, st)
            val live = cat.getStream(scope, st).incarnation
            if (fr.floor > 0L && fr.incarnation.nonEmpty && live.nonEmpty &&
                fr.incarnation != live)
              Seq(Issue(s"$scope/$st", "gc-floor-stale-incarnation",
                s"floor chain stamped by incarnation ${fr.incarnation} but " +
                  s"the live chain is $live — floor survived a " +
                  "delete+recreate; delete the floor-*.json records"))
            else Seq.empty[Issue]
          } catch { case _: Exception => Seq.empty[Issue] })
        chainIssues ++ floorIssues ++ anchorIssues ++ staleIncIssues ++ (
          try checkStream(cat, cat.getStream(scope, st), conf, floorOverride = regressedBase)
          catch {
            case e: Exception =>
              Seq(Issue(s"$scope/$st", "manifest-unreadable", e.toString))
          })
      }
      // KVT registrations: config must parse (the tables' own manifests
      // live under their storage roots and are resolved per read — the
      // catalog's registration is what fsck owns here)
      val kvIssues = cat.listKeyValueTables(scope).flatMap { t =>
        try { cat.getKeyValueTableConfig(scope, t); Seq.empty[Issue] }
        catch {
          case e: Exception =>
            Seq(Issue(s"$scope/$t", "kvt-config-unreadable", e.toString))
        }
      }
      streamIssues ++ kvIssues
    }
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: Fsck <rootDir> [scope]"))
    val issues = checkRoot(root, args.lift(1))
    if (issues.isEmpty) println(s"fsck: $root clean")
    else {
      issues.foreach(i => println(s"fsck: ${i.where} ${i.kind}: ${i.detail}"))
      sys.exit(1)
    }
  }
}
