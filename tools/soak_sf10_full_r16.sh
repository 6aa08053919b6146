#!/bin/bash
# Round-16 full-suite sf10 soak under the drained protocol (VERDICT
# item 5): every registered query, single pass per tranche-JVM with the
# ContextCleaner drain between timed slots (SPARK_GRAFT_PASSES=1), six
# alphabetic tranches so no slot inherits more than ~1/6 of the suite's
# cleaner/GC debt. spark.network.timeout=600s is the r15 protocol
# hardening (heartbeat eviction during >500 s queries on this host).
# Output: one JSON line per tranche in $OUT_DIR; merge with
# tools/merge_soak_r16.py into SOAK_sf10_full_r16.json.
set -u
OUT_DIR=${1:-/tmp/soak_sf10_r16}
N=${2:-6}
mkdir -p "$OUT_DIR"
JAR=$(ls /root/repo/target/scala-2.13/funnelreportetlpipelinespark_*.jar)
for i in $(seq 0 $((N - 1))); do
  echo "=== tranche $i/$N $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PASSES=1 \
  SPARK_GRAFT_TRANCHE=$i/$N \
  SPARK_GRAFT_BENCH_OUT="$OUT_DIR/tranche_$i.json" \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 96g \
    --conf spark.network.timeout=600s \
    --class graft.Bench "$JAR" \
    > "$OUT_DIR/tranche_$i.log" 2>&1
  echo "  exit=$? $(tail -c 200 "$OUT_DIR/tranche_$i.json" 2>/dev/null | head -c 120)"
done
echo "=== done $(date +%H:%M:%S)"
