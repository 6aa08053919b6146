#!/usr/bin/env python3
"""Merge the per-tranche soak JSONs from tools/soak_sf10_full_r16.sh
into one SOAK_sf10_full_r16.json artifact (same shape as the r14 full
series: metric/value/queries/errors + protocol note), and print the
sf0.1->sf10 per-query ratio tail against BENCH_FULL_r16.json when
present."""
import json
import glob
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf10_r16"
dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SOAK_sf10_full_r16.json"

queries, errors, canaries = {}, {}, []
for path in sorted(glob.glob(f"{out_dir}/tranche_*.json")):
    with open(path) as f:
        j = json.loads(f.read())
    queries.update(j.get("queries", {}))
    errors.update(j.get("errors", {}))
    if "canary_sec" in j:
        canaries.append(j["canary_sec"])

merged = {
    "metric": "total",
    "value": round(sum(queries.values()), 1),
    "unit": "sec",
    "sf": "/root/repo/target/sf10 (100x sf0.1 rows, 10x sf1)",
    "protocol": (
        "Round-16 full-suite sf10 soak UNDER THE DRAINED PROTOCOL "
        "(the r15 fix moved into Bench: SPARK_GRAFT_PASSES=1 drains the "
        "ContextCleaner reference buffer to stability between timed "
        "slots). 6 alphabetic tranches, one JVM each, single pass, "
        "local[32], 96g driver, spark.network.timeout=600s. The only "
        "prior full series (SOAK_sf10_full_r14.json) predates the drain "
        "and carries known 2-100x inflated entries; this one is the "
        "trustworthy scale-ratio table."
    ),
    "canary_sec": min(canaries) if canaries else None,
    "n_queries": len(queries),
    "n_errors": len(errors),
    "queries": dict(sorted(queries.items())),
    "errors": dict(sorted(errors.items())),
}
with open(dest, "w") as f:
    json.dump(merged, f, indent=1)
print(f"wrote {dest}: {len(queries)} queries, {len(errors)} errors, "
      f"total {merged['value']}s, canary {merged['canary_sec']}")

try:
    with open("/root/repo/BENCH_FULL_r16.json") as f:
        bench = json.loads(f.read())["queries"]
    ratios = sorted(((queries[q] / bench[q], q) for q in queries
                     if q in bench and bench[q] > 0), reverse=True)
    print("top sf0.1->sf10 ratios:")
    for r, q in ratios[:25]:
        print(f"  {r:8.1f}x  {q}  ({bench[q]:.2f}s -> {queries[q]:.1f}s)")
except FileNotFoundError:
    pass
