#!/usr/bin/env python3
"""Replay correctness gate for p13_embedding_neardup and p89_mutual_knn
at large SF (the pagerank_check/lpa_check/ngram_check pattern).

The committed DuckDB oracles recompute the within-bucket quadratic
cosine verify in SQL; at sf10 the 16 fixed-plane buckets hold ~8.9k-16.6k
vectors each (~2.6e9 ordered pairs), which the SQL fold formulation
cannot cover in the gate's time box. This tool replays the identical
arithmetic in blocked numpy instead, BIT-EXACTLY:

  - planes: plane[j][i] = top-60-bits(md5(f"{j}_{i+1}")) / 2^60 - 0.5
    (graft.functions.LshBucket.planes verbatim);
  - bucket bit j set iff the SEQUENTIAL-over-dims dot >= 0.0 — the numpy
    accumulation loops dim-by-dim (vectorized over rows), which is the
    exact addition order of the Spark expression's per-row loop;
  - cosine: dot/norms accumulated in the same dim-ascending order, one
    double division — IEEE-identical to CosineSimilarity's loop;
  - DECIMAL(18,6) rounding: integer micro-units via floor(x*1e6 + 0.5)
    with an exact decimal.Decimal HALF_UP fallback wherever the float
    path is within 1e-6 of a rounding boundary (Spark's Cast uses
    BigDecimal HALF_UP on the exact double expansion — Decimal(x) is the
    same exact expansion);
  - p13: pairs (id_a < id_b, same bucket) with rounded cosine >= 0.40;
  - p89: per-src top-3 within bucket by (rounded cos DESC, dst ASC) —
    a single int64 composite key, exact because micro-units are integers
    — then the mutual (both-directions) filter.

Cross-validated at sf0.01/sf0.1/sf1 against dumps the committed DuckDB
oracles hash-verified (same verdict), then used as the sf10 gate.

Usage: python tools/ann_check.py <sfDir> <verifyOutDir>
Dev-only tool (driver-side python), not part of the Scala library.
"""
import glob
import hashlib
import os
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

DIM_BLOCK = 1024  # row-block size for the (block x m) pair sweeps


def planes(n_planes, dim):
    p = np.empty((n_planes, dim))
    for j in range(n_planes):
        for i0 in range(dim):
            dig = hashlib.md5(f"{j}_{i0 + 1}".encode()).digest()
            l0 = int.from_bytes(dig[:8], "big")
            p[j, i0] = (l0 >> 4) / 1152921504606846976.0 - 0.5
    return p


def seq_dot(a, b):
    """Σ_i a[:, i] * b[:, i] accumulated dim-ascending — Spark's order."""
    acc = np.zeros(a.shape[0])
    for i in range(a.shape[1]):
        acc += a[:, i] * b[:, i]
    return acc


def round6_micro(x):
    """HALF_UP to integer micro-units, exact.

    Fast float path + Decimal fallback where x*1e6+0.5 sits within 1e-6
    of an integer (the only place the float path could misround).
    """
    t = x * 1e6 + 0.5
    r = np.floor(t).astype(np.int64)
    frac = t - r
    risky = (frac < 1e-6) | (frac > 1 - 1e-6)
    if risky.any():
        flat_x = x[risky]
        # repr(float(v)) = the shortest round-trip decimal — the same
        # input Java's Double.toString feeds Spark's double->DECIMAL(18,6)
        # cast (scala BigDecimal(d.toString)). Decimal(float(v)) would
        # round the exact binary expansion instead, which can land on the
        # other side of a 6th-digit half boundary (r10 advice).
        exact = np.array([
            int(Decimal(repr(float(v))).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP)
                .scaleb(6))
            for v in flat_x], dtype=np.int64)
        r[risky] = exact
    return r


# DECIMAL(18,6) -> DOUBLE (the finalizeDoubles cast) is the correctly
# rounded double of r/10^6; float64 division of the two exactly-
# representable operands r and 1e6 is the same correctly rounded value,
# so micro/1e6 IS the finalize cast — no Decimal needed on this edge.


def spark_rows(con, out_dir, name, cols):
    g = os.path.join(out_dir, name, "*.parquet")
    if not glob.glob(g):
        return None
    return con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet('{g}')").fetchnumpy()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    d = con.execute(
        "SELECT vec_id, embedding FROM read_parquet("
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}') ORDER BY vec_id"
    ).fetchnumpy()
    ids = d["vec_id"].astype(np.int64)
    emb = np.stack([np.asarray(e, dtype=np.float64) for e in d["embedding"]])
    n, dim = emb.shape
    pl = planes(4, dim)

    # Buckets + per-vector norms, sequential over dims.
    bucket = np.zeros(n, dtype=np.int64)
    for j in range(4):
        bucket |= (seq_dot(emb, np.broadcast_to(pl[j], emb.shape)) >= 0.0
                   ).astype(np.int64) << j
    norm2 = seq_dot(emb, emb)
    norm = np.sqrt(norm2)

    p13_pairs = {}   # (id_a, id_b) -> micro cos
    knn = {}         # src id -> list of (neg_micro, dst, micro) top-3
    for b in sorted(set(bucket.tolist())):
        sel = np.where(bucket == b)[0]
        m = len(sel)
        if m < 2:
            continue
        sub = emb[sel]
        sub_ids = ids[sel]
        sub_norm = norm[sel]
        for lo in range(0, m, DIM_BLOCK):
            hi = min(lo + DIM_BLOCK, m)
            blk = sub[lo:hi]
            # (hi-lo, m) pair dots, dim-ascending accumulation.
            dots = np.zeros((hi - lo, m))
            for i in range(dim):
                dots += np.outer(blk[:, i], sub[:, i])
            denom = np.outer(sub_norm[lo:hi], sub_norm)
            with np.errstate(invalid="ignore"):
                cos = np.where(denom == 0.0, 0.0, dots / denom)
            micro = round6_micro(cos.ravel()).reshape(cos.shape)
            # p13: id_a < id_b (strict upper triangle in id order; ids are
            # sorted, so index order == id order) and micro >= 400000.
            rows, cols_ = np.where(micro >= 400000)
            for r, c in zip(rows.tolist(), cols_.tolist()):
                ia, ib = int(sub_ids[lo + r]), int(sub_ids[c])
                if ia < ib:
                    p13_pairs[(ia, ib)] = int(micro[r, c])
            # p89: per-src top-3 by (micro DESC, dst ASC), excluding self.
            # Composite int64 key: micro in [-1e6, 1e6], dst < 2^40 head-
            # room — key = (micro + 2_000_000) * 2^40 + (2^40 - 1 - dst).
            dsts = np.broadcast_to(sub_ids, micro.shape)
            key = (micro + 2_000_000) * (1 << 40) + ((1 << 40) - 1 - dsts)
            # exclude self (diagonal of the full bucket matrix)
            for r in range(hi - lo):
                key[r, lo + r] = -1
            k = min(3, m - 1)
            top = np.argpartition(-key, k - 1, axis=1)[:, :k]
            for r in range(hi - lo):
                src = int(sub_ids[lo + r])
                cand = knn.setdefault(src, [])
                for c in top[r].tolist():
                    if c == lo + r:
                        continue
                    cand.append((-int(micro[r, c]), int(sub_ids[c]),
                                 int(micro[r, c])))
    # finalize top-3 (blocks may each contribute 3 candidates)
    top3 = {}
    for src, cand in knn.items():
        cand.sort()
        top3[src] = {(dst, mic) for _, dst, mic in cand[:3]}

    mutual = {}
    for src, cands in top3.items():
        for dst, mic in cands:
            if src < dst and any(d == src for d, _ in top3.get(dst, ())):
                mutual[(src, dst)] = mic

    failures = 0

    got13 = spark_rows(con, out_dir, "p13_embedding_neardup",
                       ["id_a", "id_b", "cos_sim"])
    if got13 is None:
        print("FAIL p13_embedding_neardup: no spark result written")
        failures += 1
    else:
        got = {(int(a), int(b)): float(c) for a, b, c in
               zip(got13["id_a"], got13["id_b"], got13["cos_sim"])}
        exp = {k: v / 1e6 for k, v in p13_pairs.items()}
        if got == exp:
            print(f"ok   p13_embedding_neardup ({len(got)} pairs, "
                  "numpy replay)")
        else:
            only_g = set(got) - set(exp)
            only_e = set(exp) - set(got)
            diff_v = {k for k in set(got) & set(exp) if got[k] != exp[k]}
            print(f"FAIL p13_embedding_neardup: {len(got)} vs {len(exp)} "
                  f"pairs; spark-only {sorted(only_g)[:3]}, "
                  f"replay-only {sorted(only_e)[:3]}, "
                  f"value-diff {sorted(diff_v)[:3]}")
            failures += 1

    got89 = spark_rows(con, out_dir, "p89_mutual_knn",
                       ["id_a", "id_b", "cos_sim"])
    if got89 is None:
        print("FAIL p89_mutual_knn: no spark result written")
        failures += 1
    else:
        got = {(int(a), int(b)): float(c) for a, b, c in
               zip(got89["id_a"], got89["id_b"], got89["cos_sim"])}
        exp = {k: v / 1e6 for k, v in mutual.items()}
        if got == exp:
            print(f"ok   p89_mutual_knn ({len(got)} pairs, numpy replay)")
        else:
            only_g = set(got) - set(exp)
            only_e = set(exp) - set(got)
            diff_v = {k for k in set(got) & set(exp) if got[k] != exp[k]}
            print(f"FAIL p89_mutual_knn: {len(got)} vs {len(exp)} pairs; "
                  f"spark-only {sorted(only_g)[:3]}, "
                  f"replay-only {sorted(only_e)[:3]}, "
                  f"value-diff {sorted(diff_v)[:3]}")
            failures += 1

    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
