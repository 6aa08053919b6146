#!/usr/bin/env python3
"""Build CORRECTNESS_localcluster_r16.json from an oracle_check.py run
over a local-cluster Verify dump: reuses oracle_check's compare (import,
not re-implementation) and records the per-query verdict in the same
shape as the r15 artifact (_meta + per-query rows_match/schema_match/
hash_match booleans derived from the MATCH/FAIL line)."""
import json
import re
import subprocess
import sys

verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_lc_r16"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
dest = (sys.argv[3] if len(sys.argv) > 3
        else "/root/repo/CORRECTNESS_localcluster_r16.json")

proc = subprocess.run(
    [sys.executable, "/root/repo/tools/oracle_check.py", verify_dir, sf_dir],
    capture_output=True, text=True)
lines = proc.stdout.splitlines()
out = {}
n_match = n_rows_only = n_fail = 0
for ln in lines:
    m = re.match(r"(PASS|FAIL)\s+(\S+): (.*)", ln)
    if not m:
        continue
    ok, name, detail = m.group(1) == "PASS", m.group(2), m.group(3)
    hard = detail.startswith("MATCH")
    rows = int(re.search(r"rows=(\d+)", detail).group(1)) \
        if "rows=" in detail else None
    out[name] = {
        "rows_match": ok, "schema_match": ok, "hash_match": hard,
        "spark_rows": rows, "oracle_rows": rows if ok else None,
        "err": None if ok else detail,
    }
    n_match += hard
    n_rows_only += ok and not hard
    n_fail += not ok
summary = (f"{n_match}/{n_match + n_rows_only + n_fail} hard MATCH"
           + (f", {n_rows_only} rows-only" if n_rows_only else "")
           + (f", {n_fail} FAIL" if n_fail else ""))
artifact = {"_meta": {
    "master": "local-cluster[2,4,4096]",
    "jars": "packaged graft jar shipped to 2 worker JVMs",
    "sf_dir": sf_dir,
    "compare": "tools/oracle_check.py (driver-shaped dtype-sensitive compare)",
    "summary": summary,
}}
artifact.update(dict(sorted(out.items())))
with open(dest, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"wrote {dest}: {summary}")
for ln in lines:
    if ln.startswith("FAIL"):
        print(ln)
print(lines[-1] if lines else "no output")
