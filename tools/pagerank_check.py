#!/usr/bin/env python3
"""Fallback correctness gate for p42_graph_authority at large SF.

The committed DuckDB oracle unrolls 3 PageRank rounds as SQL; each round
re-joins the full doubled edge list (~118M rows at sf10), and the round
join tree spills past free disk — the same oracle-cost class as p61's
unrolled LPA (tools/lpa_check.py) and p17's recursive-CTE closure
(tools/cc_check.py), with the same remedy: keep the edge DERIVATION in
DuckDB — the distinct customer–supplier pair aggregate, verbatim from the
committed oracle's first CTE, which streams through one hash aggregate —
and replay the 3 exact-integer PageRank rounds in numpy (int64
throughout: contributions are `rank // outdeg`, the damped update is
`150000 + (85 * inc) // 100` — the identical floor-division arithmetic
the Spark entry and the committed oracle use), then value-compare the
top-20 against the Spark dump exactly like check.py.

Usage: python tools/pagerank_check.py <sfDir> <verifyOutDir>
Dev-only tool (driver-side python), not part of the Scala library.
"""
import sys, os

import duckdb
import numpy as np


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    li = os.path.join(sf_dir, "lineitem.parquet")
    od = os.path.join(sf_dir, "orders.parquet")
    # Node ids match the engine: customer 2k, supplier 2k+1.
    pairs = con.execute(f"""
      SELECT DISTINCT o.o_custkey * 2 AS cnode,
                      l.l_suppkey * 2 + 1 AS snode
      FROM read_parquet('{li}') l
      JOIN read_parquet('{od}') o ON l.l_orderkey = o.o_orderkey""").fetchnumpy()
    c = pairs["cnode"].astype(np.int64)
    s = pairs["snode"].astype(np.int64)
    # Doubled (bidirectional) edge list, then factorize node ids.
    src = np.concatenate([c, s])
    dst = np.concatenate([s, c])
    nodes, src_ix = np.unique(src, return_inverse=True)
    # dst values are exactly the node set (every node has in+out edges).
    dst_ix = np.searchsorted(nodes, dst)
    n = len(nodes)
    outdeg = np.bincount(src_ix, minlength=n).astype(np.int64)
    rank = np.full(n, 1_000_000, dtype=np.int64)
    for _ in range(3):
        contrib = rank[src_ix] // outdeg[src_ix]
        inc = np.zeros(n, dtype=np.int64)
        np.add.at(inc, dst_ix, contrib)
        rank = 150_000 + (85 * inc) // 100
    label = np.where(nodes % 2 == 0,
                     np.char.add("c", (nodes // 2).astype(str)),
                     np.char.add("s", ((nodes - 1) // 2).astype(str)))
    order = sorted(range(n), key=lambda i: (-rank[i], label[i]))[:20]
    exp = [(label[i], int(rank[i])) for i in order]

    dump = os.path.join(out_dir, "p42_graph_authority", "*.parquet")
    got = [(a, int(b)) for a, b in con.execute(
        f"SELECT node, rank FROM read_parquet('{dump}') "
        "ORDER BY rank DESC, node").fetchall()]
    if got == exp:
        print(f"ok   p42_graph_authority ({len(got)} rows, "
              f"{len(c)} pairs, {n} nodes, numpy pagerank replay)")
        return 0
    print("FAIL p42_graph_authority")
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            print(f"  row {i}: got {g} expected {e}")
    if len(got) != len(exp):
        print(f"  row count: got {len(got)} expected {len(exp)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
