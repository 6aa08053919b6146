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

sf_label = ("/root/repo/target/sf1 (10x sf0.1 rows)" if "sf1_" in out_dir
            or "/sf1" in out_dir or dest.endswith("SOAK_sf1_full_r16.json")
            else "/root/repo/target/sf10 (100x sf0.1 rows, 10x sf1)")

merged = {
    "metric": "total",
    "value": round(sum(queries.values()), 1),
    "unit": "sec",
    "sf": sf_label,
    "protocol": (
        "Round-16 full-suite soak UNDER THE DRAINED PROTOCOL "
        "(the r15 fix moved into Bench: SPARK_GRAFT_PASSES=1 drains the "
        "ContextCleaner reference buffer to stability between timed "
        "slots). Alphabetic tranches, one JVM each, single pass, "
        "local[32], 96g driver, spark.network.timeout=600s. The only "
        "prior full sf10 series (SOAK_sf10_full_r14.json) predates the "
        "drain and carries known 2-100x inflated entries; this series "
        "is the trustworthy scale-ratio table."
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

def ratio_tail(base_path, label, denom_floor=0.0):
    try:
        with open(base_path) as f:
            base = json.loads(f.read())["queries"]
    except FileNotFoundError:
        return
    ratios = sorted(((queries[q] / base[q], q) for q in queries
                     if q in base and base[q] > denom_floor), reverse=True)
    print(f"top {label} ratios:")
    for r, q in ratios[:30]:
        print(f"  {r:8.1f}x  {q}  ({base[q]:.2f}s -> {queries[q]:.1f}s)")


ratio_tail("/root/repo/BENCH_FULL_r16.json", "sf0.1->sf10")
# the VERDICT-item-5 table: 10x data, so >10x time = super-linear.
# Sub-0.3s sf1 entries are JVM-overhead-dominated and produce phantom
# ratios; the table floors the denominator and the PLANS.md write-up
# notes the floor.
ratio_tail("/root/repo/SOAK_sf1_full_r16.json", "sf1->sf10",
           denom_floor=0.3)
