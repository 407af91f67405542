#!/usr/bin/env python3
"""Fallback correctness gate for p17_dedup_clusters at large SF.

DuckDB's recursive-CTE connected components materializes the full
transitive closure, which is quadratic in cluster mass — at sf1 the
replica-merged clusters made it exceed 50 min / 57 GB. This tool keeps
the gate cross-engine for the expensive part (the LSH candidate-edge
derivation runs in DuckDB, verbatim from the committed oracle's `cand`
CTE) and replaces only the closure with an exact union-find, then
value-compares against the Spark dump exactly like check.py.

Usage: python tools/cc_check.py <sfDir> <verifyOutDir>
Dev-only tool (driver-side python), not part of the Scala library.
"""
import sys, json, glob, os
import duckdb


def find(parent, x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != root:  # path compression
        parent[x], x = root, parent[x]
    return root


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))[
        "p17_dedup_clusters"]
    # Cut the oracle at the candidate clique: keep everything up to (and
    # excluding) the `cand` CTE — the per-doc band keys, verbatim from
    # the committed oracle — and derive per-bucket STAR edges instead of
    # the all-pairs clique. A bucket's star and its clique have identical
    # connected components, and the star's edge count is linear in docs
    # (the clique's is quadratic in the replica factor — the reason this
    # gate was sf1-bound before r8).
    cut = sql.index("cand AS")
    prefix = sql[:cut].rstrip().rstrip(",")
    edges = con.execute(prefix + """,
      star AS (SELECT MIN(doc_id) OVER (PARTITION BY band, h) AS rep,
                      doc_id
               FROM bands)
      SELECT DISTINCT rep, doc_id FROM star WHERE doc_id > rep""").fetchall()

    # Union by min id: the root of every set is its minimum member, so
    # find() yields the same cluster_id = min(component) as the oracle.
    parent = {}
    for a, b in edges:
        ra, rb = find(parent, a), find(parent, b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = sorted({i for e in edges for i in e})
    exp = [(i, find(parent, i)) for i in ids]

    got = con.execute(
        "SELECT doc_id, cluster_id FROM read_parquet("
        f"'{os.path.join(out_dir, 'p17_dedup_clusters', '*.parquet')}') "
        "ORDER BY doc_id").fetchall()
    got = [(int(a), int(b)) for a, b in got]
    if got == exp:
        print(f"ok   p17_dedup_clusters ({len(got)} rows, "
              f"{len(edges)} candidate edges, union-find closure)")
        return 0
    print(f"FAIL p17_dedup_clusters: rows {len(got)} vs {len(exp)}")
    exp_set, got_set = set(exp), set(got)
    bad = [x for x in got if x not in exp_set][:3]
    missing = [x for x in exp if x not in got_set][:3]
    for x in bad:
        print(f"  spark-only: {x}")
    for x in missing:
        print(f"  duck-only:  {x}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
