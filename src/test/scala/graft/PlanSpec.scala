package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regressions: the properties PLANS.md documents,
  * enforced. A change that silently un-broadcasts a dimension join,
  * drops a pushed filter, or sneaks an all-pairs cartesian into a
  * near-dup path fails here, not at 100 TB.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("filters: every predicate is pushed to the parquet scan") {
    // default metadata cap (100 chars) truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = plan(q("filters"))
    assert(p.contains("PushedFilters"))
    Seq("In(o_orderstatus", "EqualTo(o_orderpriority,1-URGENT)",
      "IsNotNull(o_custkey)").foreach(f =>
      assert(p.contains(f), s"predicate not pushed: $f\n$p"))
  }

  test("filters: scan is column-pruned to the projection") {
    val p = plan(q("filters"))
    assert(!p.contains("o_orderdate"), "unprojected column read from parquet")
  }

  test("join_broadcast: both dimension joins are broadcast, no shuffle join") {
    val p = plan(q("join_broadcast"))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("funnel_table: exactly one scan of events") {
    val p = plan(q("funnel_table"))
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"funnel must read events once\n${p.take(800)}")
  }

  test("attribution is join-free: the as-of credit comes from one window pass") {
    val p = plan(q("attribution"))
    assert(!p.contains("Join"), s"attribution must not join\n${p.take(600)}")
    assert("Window".r.findAllIn(p).size >= 1, p.take(400))
  }

  test("bootstrap_ci: the replicate aggregate partial-combines before its exchange") {
    val p = plan(q("bootstrap_ci"))
    // two-phase agg: map-side partial on (grp, r) then final — the ×48
    // explode must collapse to |groups|·R rows before shuffling
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(800))
    assert(!p.contains("CartesianProduct"))
    // the adaptive fanout is active on the single-row-group local scan
    assert(p.contains("RoundRobinPartitioning"), p.take(600))
  }

  test("welch_ttest and embed_dim_stats reduce map-side to moment rows") {
    Seq("welch_ttest", "embed_dim_stats").foreach { name =>
      val p = plan(q(name))
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$name must partial-aggregate\n${p.take(500)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$name must not join\n${p.take(500)}")
    }
  }

  test("near-dup candidate generation never degenerates to a cartesian product") {
    Seq("dedup_minhash", "dedup_simhash", "cosine_neardup",
      "neardup_signlsh", "range_join_window", "asof_join").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name has an all-pairs join")
    }
  }

  test("dedup_minhash: banded self-join shuffles (never broadcasts the O(N) side) and reuses the signature exchange") {
    val df = q("dedup_minhash")
    df.collect() // adaptive plan finalizes only on execution
    val p = plan(df)
    assert(p.contains("ShuffledHashJoin"), p.take(400))
    assert(p.contains("ReusedExchange"),
      s"signature pipeline computed twice\n${p.take(400)}")
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("cosine_topk: the only cross join is the 1-row broadcast query vector") {
    val p = plan(q("cosine_topk"))
    // BroadcastNestedLoopJoin with a 1-row build side is the intended
    // shape; a CartesianProduct (both sides unbroadcast) is not.
    assert(!p.contains("CartesianProduct"), p.take(500))
  }

  test("driver smoke contract: entry returns a non-empty funnel table") {
    assert(SparkEntry.entry(spark).count() === 18)
  }

  test("groupby aggregates use two-phase hash aggregation (map-side partials)") {
    val p = plan(q("groupby_count"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(500))
  }

  test("decontaminate_ngram: held-out grams and matched ids broadcast, corpus never shuffles") {
    val p = plan(q("decontaminate_ngram"))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("chunk_docs: map-only until the output sort (no hash exchange)") {
    val p = plan(q("chunk_docs"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle\n${p.take(600)}")
  }

  test("embed_quantize: no shuffle at all before the output sort") {
    val p = plan(q("embed_quantize"))
    assert(!p.contains("Exchange hashpartitioning"), p.take(600))
  }

  test("cohort_retention: first-touch aggregate broadcasts back onto events") {
    val p = plan(q("cohort_retention"))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("dedup_horizon / cdc-style rank filters prune partition-locally (WindowGroupLimit)") {
    val p = plan(q("dedup_horizon"))
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("runtime bloom-filter pruning injects into a selective shuffle join") {
    // The 100 TB lever behind Catalyst's InjectRuntimeFilter: when a
    // shuffle join's small side carries a selective filter, a bloom
    // filter built from it prunes the big side's rows BEFORE the
    // shuffle. Thresholds exist for production sizes; at fixture scale
    // the application side must be allowed to qualify and the join must
    // actually shuffle, or the rule correctly declines — so this pins
    // both the configs that arm it and the plan shape it produces.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val urgent = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      val p = plan(joined)
      assert(p.contains("bloom_filter") || p.contains("BloomFilterMightContain"),
        s"no runtime bloom filter injected\n${p.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("AQE splits the skewed partition on the unsalted twin of salted_join") {
    // salted_join exists for plans AQE can't rescue; this pins the
    // complementary claim — that for the rescuable shape (hot key in a
    // shuffle join, no downstream partitioning requirement) the engine's
    // AQE posture actually fires. One key carries ~1000x the median's
    // rows; thresholds are scaled to fixture bytes the same way the
    // bloom-filter test scales its scan threshold.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(0, 300000).select(
        when(col("id") < 250000, lit(0L))
          .otherwise(pmod(col("id"), lit(64L))).as("k"),
        col("id").as("v"),
        // payload bytes push the hot partition across the threshold
        lpad(lit("x"), 64, "x").as("pad"))
      val dim = spark.range(0, 64)
        .select(col("id").as("k"), (col("id") * 10).as("w"))
      // global (non-keyed) aggregate downstream: OptimizeSkewedJoin
      // declines when splitting would break a required hash
      // partitioning — a groupBy("k") here would mask the mechanism
      val j = big.join(dim.hint("merge"), "k")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      j.collect() // adaptive plan finalizes only on execution
      val p = plan(j)
      assert(p.contains("skew=true"),
        s"AQE skew-join split did not fire\n${p.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("dpp_join: runtime DynamicPruningExpression reaches the fact scan") {
    assume(new java.io.File(dir).exists)
    val df = q("dpp_join")
    df.collect() // DPP subquery materializes at execution
    val p = plan(df).toLowerCase
    assert(p.contains("dynamicpruning"),
      s"no DynamicPruningExpression in fact scan\n${p.take(1500)}")
  }

  test("join_nullsafe: EqualNullSafe key still hash-joins the broadcast dim") {
    val p = plan(q("join_nullsafe"))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "null-safe equality fell off the hash-join path")
  }

  test("multi_distinct: one scan fans through Expand, not three self-reads") {
    val p = plan(q("multi_distinct"))
    assert(p.contains("Expand"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).size === 1,
      "multiple scans for multi-distinct aggregate")
  }

  test("FuseArrayDot: composed aggregate(zip_with(*)) fuses to the native strict dot") {
    val p = plan(q("sql_dot_topk"))
    assert(p.contains("array_dot_strict"),
      s"composed dot product not fused\n${p.take(1200)}")
    assert(!p.contains("aggregate("), "higher-order fold survived the rewrite")
  }

  test("tpch_q5_like: both dim paths broadcast, date filter is pushed") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = plan(q("tpch_q5_like"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dim joins not broadcast\n${p.take(1500)}")
    assert(p.contains("IsNotNull(o_orderdate)") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      "orders date filter not pushed to the scan")
  }

  test("batch_padding: both policy windows share ONE lang exchange") {
    val p = plan(q("batch_padding"))
    assert("hashpartitioning\\(lang".r.findAllIn(p).size === 1,
      s"expected exactly one lang exchange\n${p.take(1500)}")
  }

  test("bloom_join_reduction: a single lineitem pass feeds all counters") {
    val p = plan(q("bloom_join_reduction"))
    val scans = "FileScan parquet".r.findAllIn(p).size
    // the orders side is consumed by the eager localCheckpoint, so the
    // executed plan may read parquet only for lineitem — and only once
    assert(scans <= 1, s"fact table scanned more than once\n${p.take(1500)}")
  }

  test("registry: module maps are disjoint and every query has an oracle") {
    // The SparkEntry map is a ++ of per-module maps, so a key
    // registered twice silently shadows the earlier query (and its
    // oracle) — this gate makes the collision a test failure instead.
    import graft.queries._
    val mods = Seq(
      "Relational" -> Relational.queries.keySet,
      "LlmQueries" -> LlmQueries.queries.keySet,
      "Analytics" -> Analytics.queries.keySet,
      "Scoring" -> Scoring.queries.keySet,
      "Signals" -> Signals.queries.keySet,
      "Insights" -> Insights.queries.keySet,
      "Inference" -> Inference.queries.keySet,
      "Curation" -> Curation.queries.keySet)
    for {
      (Seq((na, a), (nb, b))) <- mods.combinations(2)
      clash = a.intersect(b)
    } assert(clash.isEmpty, s"$na and $nb both register: $clash")
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((qk -- ok).isEmpty, s"queries without an oracle: ${qk -- ok}")
    assert((ok -- qk).isEmpty, s"oracles without a query: ${ok -- qk}")
    assert(qk.size === mods.map(_._2.size).sum + 5) // 5 SparkEntry-level
  }

  test("per-query conf overlays are registered, scoped, and restored") {
    // r17 (r16 verdict item 2): the shuffle-width posture is
    // engine-visible — a query declares its conf overlay and the
    // runners apply it ONLY inside that query's scope
    val overlays = SparkEntry.confOverlays
    assert(overlays.keySet.subsetOf(SparkEntry.queries.keySet),
      s"overlay for unregistered query: " +
        s"${overlays.keySet -- SparkEntry.queries.keySet}")
    // r18: the r16 assoc_rules initialPartitionNum overlay was removed
    // (its sf10 justification measured anti-scale on re-validation:
    // 53.6 s without vs 62.0 s with, tools output in OPTIMIZATION_r18);
    // the small-partition floor for starved fan-out stages is the r18
    // overlay family, pinned here via adamic_adar
    assert(!overlays.contains("assoc_rules"),
      "the refuted assoc_rules overlay must stay removed (r18 sf10 A/B)")
    assert(overlays.contains("adamic_adar"),
      "adamic_adar must carry its small-partition AQE floor (r18 A/B: " +
        "pair fan-out starved at bytes/1MB partitions)")
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prior = spark.conf.getOption(key)
    var inside = ""
    SparkEntry.withOverlay(spark, "adamic_adar") {
      inside = spark.conf.get(key)
    }
    assert(inside === "64k")
    assert(spark.conf.getOption(key) === prior,
      "overlay leaked past its query's scope")
    // restored on throw too: a failed query must not poison the next
    // bench slot's configuration
    intercept[RuntimeException] {
      SparkEntry.withOverlay(spark, "adamic_adar") {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.getOption(key) === prior,
      "overlay leaked after a throw")
    // a query with no overlay is a pass-through
    SparkEntry.withOverlay(spark, "filters") {
      assert(spark.conf.getOption(key) === prior)
    }
  }
}
