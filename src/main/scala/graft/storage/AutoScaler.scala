package graft.storage

import graft.core._

/** Auto-scale decision + execution (SURVEY §2.2), following
  * AutoScaleProcessor.java:286-302 exactly:
  *
  *   split when 2-min rate > 5× target, or 5-min > 2×, or 10-min > 1×
  *   (each gated on the segment being at least that old), into
  *   max(2, maxRate/target) children; merge when 2/5/10-min < target AND
  *   20-min < ½× target after 20 minutes; both gated by a cooldown
  *   (ScalingPolicy.java:87-89, default 10 min).
  *
  * Unlike the evenly-retiled manual scale, this scales per segment the way
  * the reference does: untouched segments carry across the epoch with
  * their ids; affected segments seal and are replaced by children/merged
  * successors with new epoch-packed ids and lineage. Rates come from the
  * manifest's EWMA meters, updated on every batch commit — no extra data
  * reads. `now` is injectable for deterministic tests.
  */
class AutoScaler(g: GraftStreams, cooldownMillis: Long = 600000L) {

  private val TwoMin = 2 * 60 * 1000L
  private val FiveMin = 5 * 60 * 1000L
  private val TenMin = 10 * 60 * 1000L
  private val TwentyMin = 20 * 60 * 1000L

  /** One evaluation pass; returns the new metadata if a scale happened. */
  def evaluate(scope: String, stream: String,
               now: Long = System.currentTimeMillis()): Option[StreamMetadata] = {
    val meta = g.catalog.getStream(scope, stream)
    val target = meta.config.targetRatePerSegment.toDouble
    if (target <= 0 || meta.isSealed) return None
    if (now - math.max(meta.lastScaleAt, meta.createdAt) < cooldownMillis) return None

    val open = meta.openSegments.sortBy(_.keyLow)
    val splits = scala.collection.mutable.Map.empty[Long, Int]
    val cold = scala.collection.mutable.Set.empty[Long]

    open.foreach { s =>
      val r = meta.segmentRates.getOrElse(s.segmentId, SegmentRates())
      val age = now - s.createdAt
      val up = (r.twoMin > 5.0 * target && age > TwoMin) ||
        (r.fiveMin > 2.0 * target && age > FiveMin) ||
        (r.tenMin > target && age > TenMin)
      if (up) {
        val maxRate = math.max(r.twoMin, math.max(r.fiveMin, r.tenMin))
        splits(s.segmentId) = math.max(2, (maxRate / target).toInt)
      } else if (r.twoMin < target && r.fiveMin < target && r.tenMin < target &&
                 r.twentyMin < target / 2.0 && age > TwentyMin) {
        cold += s.segmentId
      }
    }

    // merge adjacent cold pairs (scale-down merges neighbors,
    // AutoScaleProcessor.java:296-302); never below minSegments
    val merges = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
    var allowedMerges = open.size - math.max(1, meta.config.minSegments)
    var i = 0
    while (i < open.size - 1) {
      if (allowedMerges > 0 && cold(open(i).segmentId) && cold(open(i + 1).segmentId)) {
        merges += Seq(open(i).segmentId, open(i + 1).segmentId)
        allowedMerges -= 1
        i += 2
      } else i += 1
    }

    if (splits.isEmpty && merges.isEmpty) None
    else Some(scaleSegments(scope, stream, splits.toMap, merges.toList, now))
  }

  /** Seal the affected segments and open their successors in a new epoch;
    * carried-over segments keep their ids (the reference's epoch model:
    * EpochRecord lists the full active set, ids persist across epochs).
    */
  def scaleSegments(scope: String, stream: String, splits: Map[Long, Int],
                    merges: Seq[Seq[Long]],
                    now: Long = System.currentTimeMillis()): StreamMetadata =
    g.catalog.update(scope, stream) { m =>
      val epoch = m.currentEpoch.epoch + 1
      var nextNum = m.segments.map(s => SegmentId.number(s.segmentId)).max + 1
      val open = m.openSegments.sortBy(_.keyLow)
      val mergeHead: Map[Long, Seq[Long]] = merges.map(g => g.head -> g).toMap
      val inMerge: Set[Long] = merges.flatten.toSet

      val newSegs = scala.collection.mutable.ListBuffer.empty[SegmentRecord]
      val carried = scala.collection.mutable.ListBuffer.empty[Long]
      val sealedIds = scala.collection.mutable.Set.empty[Long]

      open.foreach { s =>
        if (splits.contains(s.segmentId)) {
          val n = splits(s.segmentId)
          val width = (s.keyHigh - s.keyLow) / n
          (0 until n).foreach { k =>
            val hi = if (k == n - 1) s.keyHigh else s.keyLow + width * (k + 1)
            newSegs += SegmentRecord(SegmentId.pack(epoch, nextNum), s.keyLow + width * k, hi,
              0L, 0L, isSealed = false, parents = Seq(s.segmentId), createdAt = now)
            nextNum += 1
          }
          sealedIds += s.segmentId
        } else if (mergeHead.contains(s.segmentId)) {
          val group = mergeHead(s.segmentId).map(id => m.segment(id))
          newSegs += SegmentRecord(SegmentId.pack(epoch, nextNum),
            group.map(_.keyLow).min, group.map(_.keyHigh).max,
            0L, 0L, isSealed = false, parents = group.map(_.segmentId), createdAt = now)
          nextNum += 1
          sealedIds ++= group.map(_.segmentId)
        } else if (!inMerge(s.segmentId)) {
          carried += s.segmentId
        } else {
          sealedIds += s.segmentId // non-head member of a merge group
        }
      }

      m.copy(
        segments = m.segments.map(s =>
          if (sealedIds(s.segmentId)) s.copy(isSealed = true) else s) ++ newSegs,
        epochs = m.epochs :+ EpochRecord(epoch, (carried ++ newSegs.map(_.segmentId)).toSeq, now),
        segmentRates = m.segmentRates -- sealedIds,
        lastScaleAt = now)
    }
}
