#!/bin/bash
# Round-16 full-suite sf1 soak under the drained protocol — the
# denominator for the sf1->sf10 per-query ratio table (VERDICT item 5).
# Same protocol as tools/soak_sf10_full_r16.sh (single pass per
# tranche-JVM, cleaner drain between timed slots) so the ratio is
# protocol-identical on both sides; 3 tranches suffice at sf1.
# Output: one JSON line per tranche in $OUT_DIR; merge with
# tools/merge_soak_r16.py.
set -u
OUT_DIR=${1:-/tmp/soak_sf1_r16}
N=${2:-3}
mkdir -p "$OUT_DIR"
JAR=$(ls /root/repo/target/scala-2.13/funnelreportetlpipelinespark_*.jar)
for i in $(seq 0 $((N - 1))); do
  echo "=== tranche $i/$N $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
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
