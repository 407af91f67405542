#!/usr/bin/env python3
"""Fallback correctness gate for p16_ngram_jaccard at large SF.

The committed DuckDB oracle evaluates exact 3-gram Jaccard with
list_filter/list_contains PER CANDIDATE PAIR — quadratic in shingle-list
length per pair on top of a blocked self-join that carries the full lists
— and blows past the per-entry wall cap at sf10. Same remedy as
pagerank_check.py / lpa_check.py / cc_check.py: keep everything LINEAR in
DuckDB (block keys, block sizes, the capped-path candidate enumeration on
ids only, the oversized-block MinHash sub-key — the expression text
verbatim from the committed oracle's CTEs), and do the per-pair set math
in Python, memoized by DISTINCT TEXT pair: replicated corpora (GenScale's
exact copies on offset ids) collapse to ~base-corpus many unique
(text_a, text_b) combos, so the jaccard core is corpus-size independent.

The jaccard value mirrors the engine exactly: |A∩B| / (|A|+|B|−|A∩B|) in
IEEE double, then ROUND_HALF_UP to 6 decimal places (Spark's
cast-to-DECIMAL(18,6) via the double's shortest decimal repr — the same
hop Verify's finalizeDoubles takes back to double).

Usage: python tools/ngram_check.py <sfDir> <verifyOutDir>
Dev-only tool (driver-side python), not part of the Scala library.
"""
import sys, os
from decimal import Decimal, ROUND_HALF_UP

import duckdb

BLOCK_CAP = 256  # graft.operators.Pipeline.DefaultBlockCap

# Verbatim from the committed oracle (cappedPairsCtesDuck /
# shinglesSqlDuck in Pipeline.scala) — the cross-engine equivalence of
# these expressions is already proven by the p15/p16 gates at sf<=1.
SHINGLES = """CASE WHEN length(string_split(text, ' ')) >= 3
     THEN list_distinct(list_transform(range(1, length(string_split(text, ' ')) - 1),
            i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
     ELSE [] END"""
SUB = """list_min(list_transform(%s,
            sg -> ('0x' || substr(md5(sg), 1, 15))::BIGINT))""" % SHINGLES


def jacc6(a, b):
    """Exact engine jaccard: double division, DECIMAL(18,6) HALF_UP,
    back to double. Returns None for an empty union (engine emits
    NaN/NULL there and the >=0.10 filter drops it)."""
    inter = len(a & b)
    union = len(a) + len(b) - inter
    if union == 0:
        return None
    x = inter / union
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    docs = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"""
      CREATE TEMP TABLE d AS
      WITH d0 AS (SELECT doc_id, lang, string_split(text, ' ')[1] AS w0,
                    CAST(FLOOR(n_chars / 200.0) AS INT) AS len_bucket,
                    md5(text) AS th, text
                  FROM read_parquet('{docs}'))
      SELECT *, COUNT(*) OVER (PARTITION BY lang, w0, len_bucket) AS blk_n
      FROM d0""")
    # Distinct-text shingle sets (linear; one list build per unique text).
    sh = {th: frozenset(lst) for th, lst in con.execute(
        f"SELECT md5(text) AS th, {SHINGLES} AS sh FROM "
        f"(SELECT DISTINCT text FROM d)").fetchall()}
    # Candidate pairs, ids + text hashes only — the committed oracle's
    # small/bigp CTEs minus every list-valued column.
    cand = con.execute(f"""
      WITH small AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.th AS ta, b.th AS tb
        FROM d a JOIN d b ON a.lang = b.lang AND a.w0 = b.w0
          AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE a.blk_n <= {BLOCK_CAP} AND b.blk_n <= {BLOCK_CAP}),
      bigsub AS (
        SELECT doc_id, lang, w0, len_bucket, th, {SUB} AS sub
        FROM d WHERE blk_n > {BLOCK_CAP}),
      big AS (
        SELECT *, MIN(doc_id) OVER (PARTITION BY lang, w0, len_bucket, sub)
          AS rep_id
        FROM bigsub),
      bigp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.th AS ta, b.th AS tb
        FROM big a JOIN big b ON a.doc_id = b.rep_id AND b.doc_id > b.rep_id)
      SELECT * FROM small UNION ALL SELECT * FROM bigp""").fetchall()
    memo = {}
    exp = []
    for id_a, id_b, ta, tb in cand:
        key = (ta, tb)
        j = memo.get(key)
        if j is None and key not in memo:
            j = memo[key] = jacc6(sh[ta], sh[tb])
        if j is not None and j >= 0.10:
            exp.append((id_a, id_b, j))
    exp.sort()

    dump = os.path.join(out_dir, "p16_ngram_jaccard", "*.parquet")
    got = [(a, b, float(j)) for a, b, j in con.execute(
        f"SELECT id_a, id_b, jaccard FROM read_parquet('{dump}') "
        "ORDER BY id_a, id_b").fetchall()]
    if got == exp:
        print(f"ok   p16_ngram_jaccard ({len(got)} rows, "
              f"{len(cand)} candidates, {len(memo)} distinct text pairs, "
              f"python jaccard replay)")
        return 0
    print(f"FAIL p16_ngram_jaccard: rows {len(got)} vs {len(exp)}")
    gs, es = set(got), set(exp)
    for r in list(gs - es)[:3]:
        print(f"  spark-only: {r}")
    for r in list(es - gs)[:3]:
        print(f"  python-only: {r}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
