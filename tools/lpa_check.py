#!/usr/bin/env python3
"""Fallback correctness gate for p61_label_propagation at large SF.

The committed DuckDB oracle unrolls 3 synchronous LPA rounds as SQL —
each round re-joins the full adjacency, and at sf10 the combined pair
CTE + per-round join tree exceeds free disk (~1.2B intermediate rows).
Same class of oracle-cost limit as p17's recursive-CTE closure, same
remedy (tools/cc_check.py): keep the expensive-but-tractable part in
DuckDB — the co-purchase EDGE derivation, verbatim from the committed
oracle's `bask`/`e0`/`e` CTEs, which streams through one aggregate and
never materializes the round joins — and replay only the 3 LPA rounds
in Python (exact dict counting, "highest count then smallest label"),
then value-compare the community rollup against the Spark dump exactly
like check.py.

Usage: python tools/lpa_check.py <sfDir> <verifyOutDir>
Dev-only tool (driver-side python), not part of the Scala library.
"""
import sys, os, glob
from collections import defaultdict

import duckdb


def lpa_rounds(edges, rounds=3):
    """Synchronous label propagation, ties to the smallest label."""
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = defaultdict(int)
            for m in nbrs:
                cnt[labels[m]] += 1
            # max count, then smallest label — the determinism knob that
            # matches the engine's min(struct(-c, label)) argmax.
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = nxt
    return labels


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    li = os.path.join(sf_dir, "lineitem.parquet")
    edges = con.execute(f"""
      WITH bask AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{li}')),
      e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
             FROM bask a JOIN bask b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey)
      SELECT u, v FROM e0 GROUP BY u, v HAVING COUNT(*) >= 2""").fetchall()

    labels = lpa_rounds(edges, rounds=3)
    comm = defaultdict(list)
    for n, l in labels.items():
        comm[l].append(n)
    exp = sorted(((l, len(ms), min(ms)) for l, ms in comm.items()),
                 key=lambda r: (-r[1], r[0]))[:20]

    dump = os.path.join(out_dir, "p61_label_propagation", "*.parquet")
    got = con.execute(
        f"SELECT community, csize, min_member FROM read_parquet('{dump}') "
        "ORDER BY csize DESC, community").fetchall()
    got = [(int(a), int(b), int(c)) for a, b, c in got]
    if got == exp:
        print(f"ok   p61_label_propagation ({len(got)} rows, "
              f"{len(edges)} edges, {len(labels)} nodes, python LPA replay)")
        return 0
    print("FAIL p61_label_propagation")
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            print(f"  row {i}: got {g} expected {e}")
    if len(got) != len(exp):
        print(f"  row count: got {len(got)} expected {len(exp)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
