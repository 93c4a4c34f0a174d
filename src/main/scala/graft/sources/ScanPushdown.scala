package graft.sources

import graft.core.{FileEntry, RoutingKeyHash, SegmentRecord}
import org.apache.spark.sql.sources._

/** Planning-time predicate pushdown for the graft-stream DSv2 scan
  * (SURVEY §2.1 batch reads). The manifest records exact per-file
  * `minEventTime`/`maxEventTime` (parquet footer stats captured at
  * commit) and exact per-segment key ranges, so three predicate shapes
  * prune FILES before a single task is planned:
  *
  *   - `eventTime` range comparisons → skip files whose recorded time
  *     span cannot overlap (the `getSegmentsAtTime` index generalized to
  *     arbitrary time predicates — controller/.../records/
  *     SegmentRecord.java keeps the same per-segment time marks);
  *   - `segmentId` equality / IN → skip other segments' files;
  *   - `routingKey` equality / IN → hash each key to [0,1)
  *     (RoutingKeyHash, the EventRouter rule) and skip files of segments
  *     whose key range contains none of the hashed points — the engine
  *     analog of the reference addressing a key to exactly one segment
  *     per epoch (client/.../stream/impl/SegmentSelector.java:60);
  *   - `stream` equality / IN (multi-stream reader-group scans) → drop
  *     whole subscriptions.
  *
  * All pruning is conservative: every pushed filter is ALSO returned to
  * Spark as a residual, so the engine never has to evaluate exotic
  * shapes (Or/Not/null-semantics) — unsupported filters simply prune
  * nothing. The recognized subset is additionally handed to the parquet
  * reader factory so surviving files still prune at row-group/page
  * granularity via column stats.
  *
  * At 100 TB this is the difference between planning O(manifest) and
  * scanning the stream: a one-day time slice of a year-long stream plans
  * ~1/365 of the files, and a single-key probe plans one segment's
  * files per epoch.
  */
final case class PushedPredicates(
    timeLo: Option[Long],
    timeHi: Option[Long],
    segIds: Option[Set[Long]],
    keyPoints: Option[Set[Double]],
    streams: Option[Set[String]],
    /** The recognized filters, verbatim — reported via `pushedFilters()`
      * (explain's PushedFilters line) and forwarded to the parquet
      * reader for row-group pruning. Never includes `stream`: that is a
      * partition column the parquet files do not contain.
      */
    recognized: Array[Filter]) {

  def isEmpty: Boolean =
    timeLo.isEmpty && timeHi.isEmpty && segIds.isEmpty &&
      keyPoints.isEmpty && streams.isEmpty

  /** Parquet-file-level filters (everything recognized except `stream`). */
  def parquetFilters: Array[Filter] = recognized.filterNot {
    case EqualTo("stream", _) | In("stream", _) => true
    case _ => false
  }

  def keepStream(key: String): Boolean = streams.forall(_.contains(key))

  /** Conjunction with another predicate set (e.g. runtime filters from a
    * join build side layered over statically-pushed filters): time
    * bounds tighten, value sets intersect. Intersecting routing-key
    * HASH points is conservative under collisions — a collision keeps a
    * file the key sets alone would drop, never the reverse.
    */
  def and(o: PushedPredicates): PushedPredicates = {
    def both[A](a: Option[Set[A]], b: Option[Set[A]]): Option[Set[A]] = (a, b) match {
      case (Some(x), Some(y)) => Some(x.intersect(y))
      case _ => a.orElse(b)
    }
    PushedPredicates(
      (timeLo.toSeq ++ o.timeLo.toSeq).maxOption,
      (timeHi.toSeq ++ o.timeHi.toSeq).minOption,
      both(segIds, o.segIds),
      both(keyPoints, o.keyPoints),
      both(streams, o.streams),
      recognized ++ o.recognized)
  }

  /** Conservative keep-test for one manifest file. `seg` is the file's
    * segment record when the manifest still carries it (always, in
    * practice); an unknown segment keeps the file.
    */
  def keepFile(f: FileEntry, seg: Option[SegmentRecord]): Boolean = {
    val timeOk = timeLo.forall(f.maxEventTime >= _) &&
      timeHi.forall(f.minEventTime <= _)
    val segOk = segIds.forall(_.contains(f.segmentId))
    val keyOk = keyPoints.forall { pts =>
      seg.forall(s => pts.exists(s.range.contains))
    }
    timeOk && segOk && keyOk
  }
}

object PushedPredicates {
  val empty: PushedPredicates =
    PushedPredicates(None, None, None, None, None, Array.empty)

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  private def asStr(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _ => None
  }

  /** Fold Spark's implicitly-ANDed filter array into prune bounds.
    * Returns the predicates plus the subset of `filters` that
    * contributed (the "recognized" set). Comparisons are widened by one
    * unit where exactness would not be conservative (strict bounds keep
    * the boundary value) — residual evaluation restores exact semantics.
    */
  def from(filters: Array[Filter]): PushedPredicates = {
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    var segs = Option.empty[Set[Long]]
    var keys = Option.empty[Set[Double]]
    var strs = Option.empty[Set[String]]

    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    def intersect[A](cur: Option[Set[A]], add: Set[A]): Option[Set[A]] =
      Some(cur.fold(add)(_.intersect(add)))

    // returns true iff the filter (or, for And, any part of it)
    // contributed to a prune bound
    def walk(f: Filter): Boolean = f match {
      case And(a, b) =>
        val ra = walk(a); val rb = walk(b); ra || rb
      case EqualTo("eventTime", v) => asLong(v).exists { n =>
        tightenLo(n); tightenHi(n); true
      }
      // runtime join filters arrive as IN sets; [min, max] of the set is
      // the tightest interval file-level bounds can use
      case In("eventTime", vs) =>
        if (vs.forall(asLong(_).isDefined)) {
          val ns = vs.flatMap(asLong)
          // empty IN matches nothing: an inverted interval prunes all
          tightenLo(if (ns.isEmpty) Long.MaxValue else ns.min)
          tightenHi(if (ns.isEmpty) Long.MinValue else ns.max)
          true
        } else false
      case GreaterThan("eventTime", v) => asLong(v).exists { n => tightenLo(n); true }
      case GreaterThanOrEqual("eventTime", v) => asLong(v).exists { n => tightenLo(n); true }
      case LessThan("eventTime", v) => asLong(v).exists { n => tightenHi(n); true }
      case LessThanOrEqual("eventTime", v) => asLong(v).exists { n => tightenHi(n); true }
      case EqualTo("segmentId", v) => asLong(v).exists { n =>
        segs = intersect(segs, Set(n)); true
      }
      case In("segmentId", vs) =>
        if (vs.forall(asLong(_).isDefined)) {
          segs = intersect(segs, vs.flatMap(asLong).toSet); true
        } else false
      case EqualTo("routingKey", v) => asStr(v).exists { s =>
        keys = intersect(keys, Set(RoutingKeyHash.hashToRange(s))); true
      }
      case In("routingKey", vs) =>
        if (vs.forall(asStr(_).isDefined)) {
          keys = intersect(keys, vs.flatMap(asStr).map(RoutingKeyHash.hashToRange).toSet)
          true
        } else false
      case EqualTo("stream", v) => asStr(v).exists { s =>
        strs = intersect(strs, Set(s)); true
      }
      case In("stream", vs) =>
        if (vs.forall(asStr(_).isDefined)) {
          strs = intersect(strs, vs.flatMap(asStr).toSet); true
        } else false
      case _ => false
    }

    val recognized = filters.filter(walk)
    PushedPredicates(lo, hi, segs, keys, strs, recognized)
  }
}
