package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the cohort/window/robust-stats and embedding/mixing
  * additions — the semantic invariants the oracle rows alone don't
  * state.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("ev_retention_cohorts: offset-0 cell equals cohort size; offsets never grow it") {
    val r = SparkEntry.queries("ev_retention_cohorts")(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter($"week_offset" < 0L).count() === 0L)
    // every user is active in their own cohort week, so the k=0 cell is
    // the cohort's full size and every later offset is <= it
    val base = r.filter($"week_offset" === 0L)
      .select($"cohort_week", $"n_users".as("cohort_size"))
    val bad = r.join(base, Seq("cohort_week"))
      .filter($"n_users" > $"cohort_size")
    assert(bad.isEmpty, s"retention cell above cohort size: ${bad.head(3).mkString}")
    r.unpersist()
  }

  test("ev_window_sliding: every event lands in exactly 4 windows; totals add up") {
    val w = SparkEntry.queries("ev_window_sliding")(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(w.agg(sum($"n_events")).head().getLong(0) === nEvents * 4)
    // window starts are slide-aligned (15 min = 9e8 us)
    assert(w.filter($"ws" % 900000000L =!= 0L).count() === 0L)
    w.unpersist()
  }

  test("ev_dau_stickiness: 0 < dau <= wau and ratio in (0, 1]") {
    val d = SparkEntry.queries("ev_dau_stickiness")(spark, sf).cache()
    assert(d.count() > 0)
    assert(d.filter($"dau" <= 0L || $"dau" > $"wau").count() === 0L)
    assert(d.filter($"stickiness" <= 0.0 || $"stickiness" > 1.0).count() === 0L)
    d.unpersist()
  }

  test("ev_anomaly_mad: median halves the distribution, MAD and outliers bounded") {
    val m = SparkEntry.queries("ev_anomaly_mad")(spark, sf).cache()
    assert(m.count() > 0)
    val ev = Tables.events(spark, sf)
      .select($"event_type", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val chk = ev.join(m, Seq("event_type"))
      .groupBy($"event_type")
      .agg(first($"n").as("n"),
        sum(when($"cents" <= $"med_cents", 1L).otherwise(0L)).as("le_med"),
        first($"n_outliers").as("n_outliers"))
    // lower median: at least half the rows are <= it
    assert(chk.filter($"le_med" * 2L < $"n").count() === 0L)
    assert(m.filter($"mad_cents" < 0L || $"n_outliers" < 0L || $"n_outliers" > $"n")
      .count() === 0L)
    m.unpersist()
  }

  test("emb_norm_stats: min <= avg <= max per label (fixed-point floor slack)") {
    val ns = SparkEntry.queries("emb_norm_stats")(spark, sf).cache()
    assert(ns.count() > 0)
    assert(ns.filter($"min_norm" > $"max_norm").count() === 0L)
    // avg accumulates floor-quantized norms: at most 1e-6 below the true
    // mean, never above max nor more than 1e-6 below min
    assert(ns.filter($"avg_norm" > $"max_norm" ||
      $"avg_norm" < $"min_norm" - 1e-6).count() === 0L)
    ns.unpersist()
  }

  test("emb_pca_power: one row per dimension, all rows see the whole corpus") {
    val p = SparkEntry.queries("emb_pca_power")(spark, sf).cache()
    val dim = Tables.embeddings(spark, sf)
      .select(size($"embedding")).head().getInt(0)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(p.count() === dim.toLong)
    assert(p.filter($"n_vecs" =!= nVecs).count() === 0L)
    // w is a real direction, not all-zero
    assert(p.filter($"w_fp" =!= 0.0).count() > 0)
    p.unpersist()
  }

  test("txt_zipf_slope: slope is negative (frequency decays with rank)") {
    val z = SparkEntry.queries("txt_zipf_slope")(spark, sf).head()
    assert(z.getAs[Long]("n") > 10L) // sf0.001's whole vocab is ~31 tokens
    assert(z.getAs[Double]("zipf_slope") < 0.0)
  }

  test("ev_session_window: events conserved, sessions disjoint with >= gap between them") {
    val sw = SparkEntry.queries("ev_session_window")(spark, sf).cache()
    assert(sw.agg(sum($"n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
    // consecutive sessions of a user are separated by at least the gap:
    // next.start_us >= prev.end_us (end already includes the 30-min gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"start_us")
    val bad = sw.withColumn("prev_end", lag($"end_us", 1).over(w))
      .filter($"prev_end".isNotNull && $"start_us" < $"prev_end")
    assert(bad.isEmpty, s"overlapping sessions: ${bad.head(3).mkString}")
    sw.unpersist()
  }

  test("ev_markov_transitions: rows per from_type sum to 1 in probability") {
    val m = SparkEntry.queries("ev_markov_transitions")(spark, sf).cache()
    assert(m.count() > 0)
    val sums = m.groupBy($"from_type").agg(sum($"p").as("sp"), sum($"n").as("sn"))
    assert(sums.filter(abs($"sp" - 1.0) > 1e-9).count() === 0L)
    // total transitions = total events - distinct users (each user's last
    // event has no successor)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(m.agg(sum($"n")).head().getLong(0) === expected)
    m.unpersist()
  }

  test("ds_token_budget: shares sum to 1 and cum_share is monotone to 1") {
    val b = SparkEntry.queries("ds_token_budget")(spark, sf).collect()
    assert(b.nonEmpty)
    assert(math.abs(b.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val cums = b.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, c) => c >= a })
    assert(math.abs(cums.last - 1.0) < 1e-9)
  }

  test("emb_centroid_dist: full strict-upper-triangle, cosines in [-1, 1]") {
    val c = SparkEntry.queries("emb_centroid_dist")(spark, sf).cache()
    val k = Tables.embeddings(spark, sf).select($"label").distinct().count()
    assert(c.count() === k * (k - 1) / 2)
    assert(c.filter($"cos" < -1.0 || $"cos" > 1.0).count() === 0L)
    assert(c.filter($"la" >= $"lb").count() === 0L)
    c.unpersist()
  }

  test("ev_ab_lift: cohorts partition users, variances non-negative") {
    val l = SparkEntry.queries("ev_ab_lift")(spark, sf).cache()
    assert(l.count() > 0)
    assert(l.filter($"var_a" < 0.0 || $"var_b" < 0.0).count() === 0L)
    // cohort counts cover every event of the type
    val totals = Tables.events(spark, sf).groupBy($"event_type").count()
    val bad = l.join(totals, Seq("event_type"))
      .filter($"n_a" + $"n_b" =!= $"count")
    assert(bad.isEmpty, s"cohorts lost events: ${bad.head(3).mkString}")
    l.unpersist()
  }

  test("ev_rfm_scores: quartiles balanced (ntile invariant), rfm digits consistent") {
    val r = SparkEntry.queries("ev_rfm_scores")(spark, sf).cache()
    val n = r.count()
    assert(n > 0)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      assert(r.filter(col(c) < 1L || col(c) > 4L).count() === 0L, s"$c out of 1..4")
      val sizes = r.groupBy(col(c)).count().collect().map(_.getLong(1))
      assert(sizes.max - sizes.min <= 1L, s"$c quartiles unbalanced: ${sizes.mkString(",")}")
    }
    assert(r.filter($"rfm" =!=
      $"r_score" * 100L + $"f_score" * 10L + $"m_score").count() === 0L)
    r.unpersist()
  }

  test("dedup_containment: asymmetric relation, bounds hold, supersets score 1") {
    val c = SparkEntry.queries("dedup_containment")(spark, sf).cache()
    assert(c.count() > 0)
    assert(c.filter($"containment" < 0.8 || $"containment" > 1.0).count() === 0L)
    assert(c.filter($"a_id" === $"b_id").count() === 0L)
    // containment must dominate Jaccard on the same (unordered) pair:
    // J = |A∩B|/|A∪B| <= |A∩B|/|A| = C(a→b)
    val j = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select($"a_id", $"b_id", $"jaccard")
    val both = c.join(j, Seq("a_id", "b_id"))
    assert(both.filter($"containment" < $"jaccard" - 1e-12).count() === 0L)
    c.unpersist()
  }

  test("ds_length_buckets: bucket is floor(log2), tokens conserved") {
    val b = SparkEntry.queries("ds_length_buckets")(spark, sf).cache()
    assert(b.count() > 0)
    // n_tokens of a (source, bucket) cell must fit the bucket's range:
    // n_docs * 2^bucket <= n_tokens < n_docs * 2^(bucket+1)
    val bad = b.filter($"n_tokens" < $"n_docs" * expr("CAST(1 AS BIGINT) << bucket") ||
      $"n_tokens" >= $"n_docs" * expr("CAST(2 AS BIGINT) << bucket"))
    assert(bad.isEmpty, s"bucket range violated: ${bad.head(3).mkString}")
    val total = Tables.documents(spark, sf)
      .select(sum(size(split(trim($"text"), "\\s+")))).head().getLong(0)
    assert(b.agg(sum($"n_tokens")).head().getLong(0) === total)
    b.unpersist()
  }

  test("txt_char_entropy: 0 <= H <= ln(n_distinct_chars), len conserved") {
    val e = SparkEntry.queries("txt_char_entropy")(spark, sf).cache()
    assert(e.count() === Tables.documents(spark, sf).count())
    assert(e.filter($"entropy_nats" < 0.0).count() === 0L)
    // max entropy is ln(alphabet size); allow the 1e-4 quantization slack
    assert(e.filter($"entropy_nats" >
      log($"n_distinct_chars".cast("double")) + 1e-4).count() === 0L)
    assert(e.join(Tables.documents(spark, sf), Seq("doc_id"))
      .filter($"len" =!= length($"text").cast("long")).count() === 0L)
    e.unpersist()
  }

  test("txt_source_kl: KL non-negative (up to quantization slack), all sources present") {
    val k = SparkEntry.queries("txt_source_kl")(spark, sf).cache()
    assert(k.count() ===
      Tables.documents(spark, sf).select($"source").distinct().count())
    // Gibbs: KL >= 0; the 1e-4 log quantization can dip a term by at
    // most 1e-4 nats
    assert(k.filter($"kl_nats" < -1e-4).count() === 0L)
    k.unpersist()
  }

  test("txt_bpe_pairs: 20 two-char pairs, counts descending") {
    val p = SparkEntry.queries("txt_bpe_pairs")(spark, sf).collect()
    assert(p.length === 20)
    assert(p.forall(_.getAs[String]("pair").length == 2))
    val cnts = p.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("txt_winnow_overlap: ordered pairs, threshold respected, overlap is real") {
    import graft.functions.GraftFunctions.winnowed_fingerprints
    val o = SparkEntry.queries("txt_winnow_overlap")(spark, sf).cache()
    assert(o.count() > 0)
    assert(o.filter($"a_id" >= $"b_id" || $"shared_fps" < 3L).count() === 0L)
    // spot-check one reported pair: its docs genuinely share >= 3
    // distinct fingerprints (recompute via the kernel, no df pruning —
    // pruning can only reduce the shared count)
    val r = o.head()
    val fps = Tables.documents(spark, sf)
      .filter($"doc_id" === r.getLong(0) || $"doc_id" === r.getLong(1))
      .select($"doc_id", explode(array_distinct(winnowed_fingerprints($"text", 8, 16))).as("fp"))
    val shared = fps.groupBy($"fp").count().filter($"count" === 2L).count()
    assert(shared >= r.getLong(2),
      s"pair (${r.getLong(0)},${r.getLong(1)}) reports ${r.getLong(2)} shared fps, found only $shared")
    o.unpersist()
  }

  test("txt_bigram_nll: nll positive, bounded by the smoothing floor") {
    val b = SparkEntry.queries("txt_bigram_nll")(spark, sf).cache()
    assert(b.count() > 0)
    // every log-prob is in (-ln(c1_max + V), 0) => nll strictly positive
    assert(b.filter($"nll" <= 0.0).count() === 0L)
    // an unseen bigram scores ln(1/(0+V)) at worst: nll <= ln(maxDen)
    // with maxDen = total train bigrams + vocab (loose upper bound)
    val trainB = GramStage.explodeGrams(Tables.documents(spark, sf), 2)
      .filter($"doc_id" % 10 < 8)
    val maxDen = trainB.count().toDouble + 1e6
    assert(b.filter($"nll" > math.log(maxDen)).count() === 0L)
    b.unpersist()
  }

  test("ds_interleave: positions are a prefix of the round-robin schedule") {
    val i = SparkEntry.queries("ds_interleave")(spark, sf).cache()
    val rows = i.collect()
    assert(rows.nonEmpty)
    // no duplicate positions, every source index < 20, and positions
    // within a source step by exactly 20
    assert(rows.map(_.getAs[Long]("pos")).distinct.length === rows.length)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    for ((_, rs) <- bySrc) {
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps.zip(ps.tail).forall { case (a, b) => b - a == 20L },
        s"non-round-robin stride within a source: ${ps.mkString(",")}")
    }
    i.unpersist()
  }

  test("ds_interleave: source -> src_idx name parse is total and injective") {
    // interleave derives its lane index by parsing a digit run out of
    // the source name. A digit-less source would regexp_extract -> ""
    // -> null (silent row drop vs a DuckDB CAST error); two sources
    // sharing one index would collide positions. Pin both properties
    // over the actual corpus so a testdata/source-naming change fails
    // loudly here instead of as a silent oracle drift.
    val m = Tables.documents(spark, sf)
      .select($"source").distinct()
      .withColumn("src_idx",
        regexp_extract($"source", "(\\d+)", 1).cast("long"))
      .collect()
    assert(m.nonEmpty)
    val bad = m.filter(_.isNullAt(1)).map(_.getString(0))
    assert(bad.isEmpty, s"digit-less source names break interleave: ${bad.mkString(",")}")
    val idx = m.map(_.getLong(1))
    assert(idx.distinct.length === idx.length,
      s"source indices collide: ${idx.sorted.mkString(",")}")
    assert(idx.forall(i => i >= 0 && i < 20),
      s"source index outside the 20-lane stride: ${idx.sorted.mkString(",")}")
  }
}
