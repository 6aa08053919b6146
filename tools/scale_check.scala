// 10x scale spot-check for the round-7 heavy operators.
// Run: spark-shell --driver-memory 16g --driver-class-path target/scala-2.13/classes -i tools/scale_check.scala
// (size the heap: local-mode executors share the driver JVM; the default
//  1g starves the persisted-edges dedup pipelines and reports GC, not plan cost)
// Replicates documents/embeddings/events (sf0.1) 10x with shifted ids into
// /tmp/graft_scale10, then times the registered queries through their real
// entry points (SparkEntry.queries) against that dir. Every text is
// replicated 10x, so dup clusters carry real collision load.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

val s = graft.GraftSession.tune(spark)
val src = "/root/testdata/sf0.1"
val out = "/tmp/graft_scale10"

def rep(name: String, idCols: Map[String, Long]): Unit = {
  val base = s.read.parquet(s"$src/$name.parquet")
  val parts = (0 until 10).map { i =>
    idCols.foldLeft(base) { case (df, (c, stride)) =>
      df.withColumn(c, col(c) + lit(i * stride))
    }
  }
  parts.reduce(_.unionByName(_)).write.mode("overwrite")
    .parquet(s"$out/$name.parquet")
}
rep("documents", Map("doc_id" -> 1000000L))
rep("embeddings", Map("vec_id" -> 1000000L))
rep("events", Map("event_id" -> 10000000L, "user_id" -> 100000L))
// orders and lineitem shift o_orderkey/l_orderkey by the SAME stride so
// dq_checks' orphan-FK join stays violation-free at 10x; l_suppkey and
// l_partkey shift too so the pagerank/graph edge SET actually grows 10x
// (otherwise distinct() collapses the replicas back to the 1x graph).
// customer/supplier/part dims stay 1x -- none of the timed queries join
// the shifted keys against them.
rep("orders", Map("o_orderkey" -> 10000000L))
rep("lineitem", Map("l_orderkey" -> 10000000L,
                    "l_suppkey" -> 100000L, "l_partkey" -> 1000000L))
// small dims pass through unchanged
for (t <- Seq("customer", "supplier", "part", "nation", "region")) {
  s.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
    .parquet(s"$out/$t.parquet")
}
println(s"replicated 10x -> $out")

def time(name: String): Unit = {
  val q = graft.SparkEntry.queries(name)
  val t0 = System.nanoTime()
  val n = q(s, out).count()
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"SCALE10 $name%-20s $sec%8.2f s  rows=$n")
}
// warm the JIT on a cheap one first
time("dedup_exact")
for (q <- Seq("dedup_cluster", "dedup_keep_best", "repetition_filter",
              "shard_assign", "sessionize", "kmeans_step", "dq_checks",
              "cdc_latest", "dedup_minhash", "token_count_bpe",
              // round-7 analytics batch heavies
              "decontaminate_ngram", "funnel_ordered", "line_dedup",
              "chunk_docs", "embed_quantize", "time_weighted_avg",
              "cohort_retention", "distinct_gate",
              // round-8 batch (lineitem also needs replication for
              // pagerank_iter to see 10x input rows)
              "bm25_rank", "pmi_bigrams", "entropy_score",
              "substring_dedup", "rendezvous_shard", "pagerank_iter",
              "rolling_distinct", "bpe_merge_step", "mixture_weights",
              "ann_sq8", "inverted_probe", "unigram_logprob", "semdedup",
              "ann_pq_adc", "pack_chunks", "decontaminate_embed",
              // round-8 Signals batch
              "prefix_jaccard", "bigram_logprob", "ewma_smooth",
              "feature_hash", "weighted_sample", "winsorize",
              "triangle_count", "bfs_levels", "skyline", "table_checksum",
              "kanonymity", "negative_sample", "jaro_winkler",
              "decayed_sum",
              // round-8 uncertainty/drift/privacy batch
              "bootstrap_ci", "psi_drift", "welch_ttest", "ldiversity",
              "sketch_quantiles", "dsir_select", "kl_drift",
              "top_journeys", "profile_table",
              // round-8 final batch
              "attribution", "embed_dim_stats", "dense_ids",
              "split_leakage", "survival_curve", "seasonal_dow",
              "rfm_segments", "powerlaw_alpha", "concentration")) time(q)
System.exit(0)
