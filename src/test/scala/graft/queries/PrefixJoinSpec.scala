package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-9 additions: the prefix-filter
  * similarity join's LOSSLESSNESS (its whole claim — exact results
  * without all-pairs), triangle-count sanity on closed-form graphs,
  * SCD2 interval tiling, and the OLS sufficient-statistics identity.
  */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("dedup_prefix_join equals the brute-force exact join (losslessness)") {
    // Brute force: every doc pair, exact Jaccard over doc-distinct word
    // 3-grams, same θ = 1/2 — O(N²) on the smoke corpus only.
    val toks = GramStage.explodeGrams(
      Tables.documents(spark, sf), 3, distinctPerDoc = true)
    val arrs = toks.groupBy($"doc_id")
      .agg(collect_list($"g").as("gs"))
    import graft.functions.GraftFunctions.sorted_intersect_size
    val h = arrs.select($"doc_id",
      array_sort(transform($"gs", g => xxhash64(g))).as("hs"), size($"gs").as("sz"))
    val brute = h.as("a").crossJoin(h.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("inter", sorted_intersect_size($"a.hs", $"b.hs"))
      .withColumn("jaccard",
        $"inter".cast("double") / ($"a.sz" + $"b.sz" - $"inter"))
      .filter($"jaccard" * 2 >= 1)
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"), $"inter")
    val fast = SparkEntry.queries("dedup_prefix_join")(spark, sf)
      .select($"a_id", $"b_id", $"inter")
    assert(brute.exceptAll(fast).isEmpty,
      s"prefix filter LOST pairs: ${brute.exceptAll(fast).head(5).mkString("; ")}")
    assert(fast.exceptAll(brute).isEmpty,
      s"prefix join emitted non-qualifying pairs: ${fast.exceptAll(brute).head(5).mkString("; ")}")
    assert(fast.count() > 0, "smoke corpus should contain near-dup pairs at θ=0.5")
  }

  test("prefix-join saturation guard trips loudly before the candidate join") {
    val docs = Tables.documents(spark, sf)
    val e = intercept[IllegalArgumentException] {
      DedupOps.prefixJoinImpl(docs, maxCandidates = 0L).count()
    }
    assert(e.getMessage.contains("exceeds 0"), e.getMessage)
    assert(e.getMessage.contains("MinHashLSH"), "the error must name the escape path")
    // and the real ceiling admits the smoke corpus
    assert(DedupOps.prefixJoinImpl(docs, DedupOps.MaxPrefixCandidates).count() > 0)
  }

  test("txt_host_triangles: counts are non-negative and bounded by C(hosts-1, 2)") {
    val r = SparkEntry.queries("txt_host_triangles")(spark, sf).cache()
    assert(r.count() > 0, "the synthetic host graph is dense — triangles must exist")
    val hosts = r.count()
    val maxPerHost = r.agg(max($"n_triangles")).head().getLong(0)
    // a host's triangles are pairs of its neighbors: ≤ C(deg, 2) < C(hosts, 2)
    assert(maxPerHost <= hosts * (hosts - 1) / 2)
    // global consistency: Σ per-host counts ≡ 0 (mod 3) — every triangle
    // contributes exactly 3 participations
    val total = r.agg(sum($"n_triangles")).head().getLong(0)
    assert(total % 3 === 0L, s"participation sum $total not divisible by 3")
    r.unpersist()
  }

  test("kv_scd2_history: intervals tile each key's history; exactly one current per live key") {
    val r = SparkEntry.queries("kv_scd2_history")(spark, sf).cache()
    assert(r.count() > 0)
    // current rows carry the open sentinel; closed rows strictly ordered
    assert(r.filter($"is_current" && $"valid_to" =!= 0L).count() === 0L)
    assert(r.filter(!$"is_current" && $"valid_to" <= $"valid_from").count() === 0L)
    // per key: at most one open interval, and closed intervals chain
    // (next valid_from == previous valid_to by construction of LEAD)
    val dup = r.filter($"is_current").groupBy($"pk").count().filter($"count" > 1)
    assert(dup.isEmpty, s"multiple current rows: ${dup.head(3).mkString}")
    // removed keys (custkey % 7 == 0) have NO current row
    val removedWithCurrent = r.filter($"is_current" &&
      ($"pk".cast("long") % 7 === 0)).count()
    assert(removedWithCurrent === 0L, "REMOVE must close the final interval")
    r.unpersist()
  }

  test("ev_attribution_linear: attributed cents reconcile to purchase revenue exactly") {
    val r = SparkEntry.queries("ev_attribution_linear")(spark, sf)
    val attributed = r.agg(sum($"attributed_cents")).head().getLong(0)
    val revenue = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))).head().getLong(0)
    assert(attributed === revenue,
      s"attribution leaked cents: $attributed attributed vs $revenue revenue")
  }

  test("ev_disorder_stats: late counts bounded; per-user definition yields non-negative lateness") {
    val r = SparkEntry.queries("ev_disorder_stats")(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter($"n_late" > $"n_events").count() === 0L)
    assert(r.filter($"max_late_us" < 0L || $"sum_late_us" < 0L).count() === 0L)
    r.unpersist()
  }

  test("ev_countmin_point: one-sided overcount, bounded by the corpus") {
    val r = SparkEntry.queries("ev_countmin_point")(spark, sf).cache()
    assert(r.count() === 10L) // the fixed probe set, present keys or not
    assert(r.filter($"overcount" < 0L).count() === 0L,
      "Count-Min must never undercount")
    val total = Tables.events(spark, sf).count()
    assert(r.filter($"est" > total).count() === 0L,
      "no cell can exceed the corpus size")
    r.unpersist()
  }

  test("ev_trend_ols: slope/intercept reproduce the daily means (regression identity)") {
    val r = SparkEntry.queries("ev_trend_ols")(spark, sf).cache()
    assert(r.count() > 0)
    // the fitted line passes through (x̄, ȳ): intercept + slope·x̄ = ȳ.
    // Recompute the daily panel and check per type to 1e-6 relative.
    val daily = Tables.events(spark, sf)
      .select($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date")).cast("long").as("x"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"x").agg(sum($"cents").as("y"))
    val x0 = daily.agg(min($"x")).head().getLong(0)
    val stats = daily.groupBy($"event_type")
      .agg(avg($"x" - x0).as("mx"), avg($"y").as("my"))
    val bad = r.join(stats, "event_type")
      .withColumn("resid", abs($"intercept" + $"slope" * $"mx" - $"my"))
      .filter($"resid" > abs($"my") * 1e-9 + 1e-6)
    assert(bad.isEmpty, s"line misses the centroid: ${bad.head(3).mkString}")
    r.unpersist()
  }
}
