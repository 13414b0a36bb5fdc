#!/usr/bin/env python3
"""Per-query scaling ratios between two Bench artifacts (sf0.1 vs sf1).

Usage: python3 tools/scaling_ratios.py <bench_sf0.1.json> <bench_sf1.json>

Prints a markdown table sorted by ratio descending (worst scaling
first). With 10x data, a linear-work query should land near 10x or
below (fixed per-job overheads amortize, so well-partitioned scans
often come in far under); the known O(n^2/blocks) index builds are
expected above it and called out by name.
"""
import sys, json

QUADRATIC = {
    # exact m-NN graph builds: block self-join, O(n^2/blocks) by design
    # (the approximate build hnsw_edges_approx is the scale path)
    "hnsw_edges", "knn_graph", "hnsw_insert_delta", "hnsw_delete_delta",
    "hnsw_upsert_roundtrip",
}

def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(set(qa) & set(qb)):
        r = qb[name] / qa[name] if qa[name] > 0 else float("inf")
        rows.append((r, name, qa[name], qb[name]))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    flagged = 0
    for r, name, ta, tb in rows:
        note = ""
        if name in QUADRATIC:
            note = "O(n²/blocks) exact build (known; approx build is the scale path)"
        elif r > 10.0:
            note = "**worse than 10×**"
            flagged += 1
        print(f"| {name} | {ta:.3f} | {tb:.3f} | {r:.2f}× | {note} |")
    tot_a = sum(qa[n] for _, n, _, _ in rows)
    tot_b = sum(qb[n] for _, n, _, _ in rows)
    print(f"\ntotal: {tot_a:.1f} s -> {tot_b:.1f} s "
          f"({tot_b/tot_a:.2f}x on 10x data); "
          f"{flagged} non-quadratic queries above 10x")

if __name__ == "__main__":
    main()
