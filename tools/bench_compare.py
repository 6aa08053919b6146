#!/usr/bin/env python3
"""Canary-normalized bench comparison (verdict r16 item 5).

Usage: bench_compare.py <before.json> <after.json> [--family] [--top N]

Both inputs are full-bench artifacts (the one-line JSON Bench writes:
`queries` per-query seconds + `canary_sec`). Output: per-query table of
raw and canary-normalized ratios, family subtotals, and a stated noise
band. Normalization: after_norm = after_raw / (canary_after /
canary_before) — i.e. "what the after-run would have measured on the
before-run's host speed". Per the r14-r16 bench-protocol findings,
treat per-query moves within ±30% (sub-2 s queries) / ±15% (longer
queries) as inside the noise band unless reproduced isolated.
"""
import json
import sys


def family(q):
    if q.startswith("stream_"):
        return "stream"
    if any(q.startswith(p) for p in (
            "connected_components", "mis_luby", "label_propagation",
            "bfs_levels", "sssp_weighted", "kcore", "ktruss",
            "triangle_count", "adamic_adar", "modularity", "graph_",
            "hits_", "pagerank", "dbscan", "embed_power")):
        return "graph-iter"
    if any(s in q for s in ("dedup", "neardup", "decontaminate",
                            "jaccard", "cosine", "ann_", "semdedup",
                            "minhash", "simhash", "winnow",
                            "containment")):
        return "dedup-ann"
    if q.startswith("tpch_") or q.startswith("join_"):
        return "tpch-join"
    return "other"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    before = json.load(open(args[0]))
    after = json.load(open(args[1]))
    top_n = 0
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])
    # prefer the parallel-throughput canary (r17+): the single-core one
    # misses all-core steal/turbo shifts, which is most of what actually
    # moves between rounds on this host. Use it only when BOTH artifacts
    # carry it — mixing a parallel canary on one side with a single-core
    # canary on the other would produce a meaningless host_ratio.
    both_par = ("canary_par_sec" in before) and ("canary_par_sec" in after)
    cb = before["canary_par_sec"] if both_par else before.get("canary_sec")
    ca = after["canary_par_sec"] if both_par else after.get("canary_sec")
    host_ratio = (ca / cb) if (cb and ca) else 1.0
    qb, qa = before["queries"], after["queries"]
    common = sorted(set(qb) & set(qa))
    only_b = set(qb) - set(qa)
    only_a = set(qa) - set(qb)
    print(f"canary: before={cb} after={ca} host_ratio={host_ratio:.3f}")
    print(f"common={len(common)} removed={sorted(only_b)} "
          f"added={sorted(only_a)}")
    rows = []
    for q in common:
        norm = qa[q] / host_ratio
        rows.append((q, qb[q], qa[q], norm, norm / qb[q]))
    tb = sum(qb[q] for q in common)
    ta = sum(qa[q] for q in common)
    print(f"TOTAL common: before={tb:.1f}s after_raw={ta:.1f}s "
          f"after_norm={ta / host_ratio:.1f}s "
          f"ratio_norm={ta / host_ratio / tb:.3f}")
    fams = {}
    for q, b, a, n, r in rows:
        f = fams.setdefault(family(q), [0.0, 0.0])
        f[0] += b
        f[1] += n
    print("\nfamily subtotals (canary-normalized):")
    for f, (b, n) in sorted(fams.items(), key=lambda x: -x[1][0]):
        print(f"  {f:12s} before={b:7.1f}s after_norm={n:7.1f}s "
              f"ratio={n / b:5.2f}")
    if top_n:
        print(f"\ntop {top_n} improvements (normalized ratio):")
        for q, b, a, n, r in sorted(rows, key=lambda x: x[4])[:top_n]:
            print(f"  {q:32s} {b:7.2f} -> {n:7.2f}  ({r:4.2f}x)")
        print(f"\ntop {top_n} regressions (normalized ratio):")
        for q, b, a, n, r in sorted(rows, key=lambda x: -x[4])[:top_n]:
            print(f"  {q:32s} {b:7.2f} -> {n:7.2f}  ({r:4.2f}x)")
    noise = "±30% (<2 s) / ±15% (>=2 s) per query unless reproduced isolated"
    print(f"\nnoise band: {noise}")


if __name__ == "__main__":
    main()
