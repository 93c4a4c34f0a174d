package graft.storage

import graft.core._

/** Periodic retention job (SURVEY §2.9; StreamMetadataTasks.java:968-1154,
  * PeriodicRetention.java:51): computes a truncation cut from the stream's
  * policy and raises the head.
  *
  *  - time-based: drop rows whose eventTime is older than
  *    `now - retentionMillis` (getTruncationStreamCutByTimeLimit analog,
  *    here on the event-time domain so tests are deterministic);
  *  - size-based: keep at most `retentionMaxRows` live rows, trimming the
  *    oldest proportionally per segment (BySizeLimit:1079);
  *  - consumption-based: never truncate past the slowest subscriber's
  *    named `sub:` cut (ReaderGroupConfig.StreamDataRetention min-cut
  *    semantics) — the subscriber bound caps both policies.
  */
class Retention(g: GraftStreams) {

  /** One pass; returns the applied cut if anything was truncated. */
  def apply(scope: String, stream: String,
            now: Long = System.currentTimeMillis()): Option[StreamCut] = {
    val meta = g.catalog.getStream(scope, stream)
    val cfg = meta.config
    if (cfg.retentionMillis <= 0 && cfg.retentionMaxRows <= 0) return None

    val head = meta.headStreamCut.positions
    val tail = meta.tailCut.positions

    val timeCut: Map[Long, Long] =
      if (cfg.retentionMillis <= 0) Map.empty
      else g.segmentsAtTime(scope, stream, now - cfg.retentionMillis).positions

    val sizeCut: Map[Long, Long] =
      if (cfg.retentionMaxRows <= 0) Map.empty
      else {
        val live = meta.segments.map(s =>
          s.segmentId -> (tail(s.segmentId) - head.getOrElse(s.segmentId, 0L))).toMap
        val total = live.values.sum
        val excess = total - cfg.retentionMaxRows
        if (excess <= 0) Map.empty
        else live.map { case (sid, n) =>
          val drop = if (total == 0) 0L else excess * n / total
          sid -> (head.getOrElse(sid, 0L) + drop)
        }
      }

    if (timeCut.isEmpty && sizeCut.isEmpty) return None

    // policy cut = furthest the policies want to advance
    val policyCut = meta.segments.map { s =>
      val sid = s.segmentId
      sid -> math.max(timeCut.getOrElse(sid, 0L), sizeCut.getOrElse(sid, 0L))
    }.toMap

    // subscriber bound: min position over all `sub:` cuts per segment
    val subCuts = meta.namedCuts.collect { case (n, c) if n.startsWith("sub:") => c }
    val bounded = policyCut.map { case (sid, off) =>
      val bound = subCuts.flatMap(_.get(sid)) match {
        case cuts if cuts.nonEmpty => cuts.min
        case _ => Long.MaxValue
      }
      sid -> math.min(off, bound)
    }

    val effective = bounded.filter { case (sid, off) => off > head.getOrElse(sid, 0L) }
    if (effective.isEmpty) None
    else {
      val cut = StreamCut(effective)
      g.catalog.truncateStream(scope, stream, cut)
      Some(cut)
    }
  }
}
