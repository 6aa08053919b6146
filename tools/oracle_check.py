#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ (Spark parquet result) and the dumped
oracle_sql.json, runs each oracle against the sf_dir parquet tables in
DuckDB, and compares: column names (sorted), row count, and values
(rows sorted by all columns, exact equality; doubles compared bitwise
after float64 coercion). Prints one line per query + a summary.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    return v


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    results = {}
    for d in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = d.name
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(s_rows)}"
            continue
        try:
            o = con.sql(oracle[name])
            o_cols, o_rows = list(o.columns), o.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if sorted(s_cols) != sorted(o_cols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}"
            continue
        if len(s_rows) != len(o_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
            continue
        # align column order by sorted name, then sort rows
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        o_ix = [o_cols.index(c) for c in sorted(o_cols)]
        key = lambda r: tuple((x is None, str(x)) for x in r)
        s_sorted = sorted([tuple(norm(r[i]) for i in s_ix) for r in s_rows], key=key)
        o_sorted = sorted([tuple(norm(r[i]) for i in o_ix) for r in o_rows], key=key)
        if s_sorted == o_sorted:
            results[name] = f"MATCH rows={len(s_rows)}"
        else:
            diffs = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs={diffs}"

    ok = sum(1 for v in results.values() if v.startswith(("MATCH", "NO-ORACLE")))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith(('MATCH','NO-ORACLE')) else 'FAIL':4} {k}: {v}")
    print(f"== {ok}/{len(results)} ok")
    sys.exit(0 if ok == len(results) else 1)


if __name__ == "__main__":
    main()
