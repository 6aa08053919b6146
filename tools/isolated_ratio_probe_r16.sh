#!/bin/bash
# Round-16 isolated re-measurement of every >10x sf1->sf10 soak ratio:
# one fresh JVM per (query, sf) so neither side carries tranche
# neighborhood effects (the drained soak is trustworthy for TOTALS, but
# individual entries still absorb up to ~3x from JVM/page-cache/GC
# neighborhood in both directions — measured r16: correlation_matrix
# 20.9 s in-tranche vs 8.7 s isolated-reproducible at sf10, while
# interval_join read 52 s in-tranche vs 15 s isolated). The resulting
# per-query ratios are the PLANS.md scale table.
set -u
OUT_DIR=${1:-/tmp/iso_ratio_r16}
mkdir -p "$OUT_DIR"
JAR=$(ls /root/repo/target/scala-2.13/funnelreportetlpipelinespark_*.jar)
QUERIES=(cosine_neardup bfs_levels cosine_topk interval_join
  correlation_matrix ann_pq_adc semdedup multimodal_frames assoc_rules
  range_join_window contamination_score connected_components
  bootstrap_ci modularity_score decontaminate_bloom multimodal_features
  mixture_weights curation_pipeline batch_padding winnow_fingerprint)
for sf in sf1 sf10; do
  for q in "${QUERIES[@]}"; do
    out="$OUT_DIR/${sf}_${q}.json"
    [ -s "$out" ] && continue
    SPARK_GRAFT_SF_DIR=/root/repo/target/$sf \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=$q \
    SPARK_GRAFT_BENCH_OUT="$out" \
    /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 96g \
      --conf spark.network.timeout=600s \
      --class graft.Bench "$JAR" \
      > "$OUT_DIR/${sf}_${q}.log" 2>&1
    echo "$sf $q exit=$? $(tail -c 120 "$out" 2>/dev/null)"
  done
done
echo "=== done $(date +%H:%M:%S)"
