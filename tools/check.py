#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same TESTDATA tables, sort columns by name, sort rows,
compare values. Dev-only tool (driver-side python), not part of the
Scala library.

Usage: python tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob, os
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table(rows):
    return sorted(["\x01".join(norm(v) for v in row) for row in rows])

# Dumps larger than this skip the fetch-into-Python sort and compare
# entirely inside DuckDB (big_compare below).
MAX_FETCH = int(os.environ.get("CHECK_MAX_FETCH", 20_000_000))

def big_compare(con, res_glob, sql):
    con.execute("CREATE OR REPLACE TEMP TABLE got_big AS "
                f"SELECT * FROM read_parquet('{res_glob}')")
    con.execute(f"CREATE OR REPLACE TEMP TABLE exp_big AS {sql}")
    gcols = sorted(r[0] for r in con.execute("DESCRIBE got_big").fetchall())
    ecols = sorted(r[0] for r in con.execute("DESCRIBE exp_big").fetchall())
    if gcols != ecols:
        return False, f"columns {gcols} != {ecols}"
    sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in gcols)
    ng, ne = (con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
              for t in ("got_big", "exp_big"))
    if ng != ne:
        return False, f"rows {ng} vs {ne}"
    d1 = con.execute(f"SELECT COUNT(*) FROM (SELECT {sel} FROM got_big "
                     f"EXCEPT ALL SELECT {sel} FROM exp_big)").fetchone()[0]
    d2 = con.execute(f"SELECT COUNT(*) FROM (SELECT {sel} FROM exp_big "
                     f"EXCEPT ALL SELECT {sel} FROM got_big)").fetchone()[0]
    if d1 or d2:
        return False, f"{d1} spark-only / {d2} duck-only rows of {ng}"
    return True, ""

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result written")
            n_bad += 1
            continue
        n_rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{res_glob}')").fetchone()[0]
        if n_rows > MAX_FETCH:
            # Too big to sort/compare in Python (sf10 dumps reach 10^8
            # rows): exact multiset compare inside DuckDB instead —
            # VARCHAR-cast both sides (same normalization role as norm())
            # and EXCEPT ALL in both directions. Zero diffs + equal counts
            # is the same verdict the in-Python path would reach.
            ok, msg = big_compare(con, res_glob, oracle[name])
            if ok:
                print(f"ok   {name} ({n_rows} rows, in-duckdb compare)")
                n_ok += 1
            else:
                print(f"FAIL {name}: {msg}")
                n_bad += 1
            continue
        got_df = con.execute(
            f"SELECT * FROM read_parquet('{res_glob}')").fetchdf()
        got_cols = sorted(got_df.columns)
        got = table(con.execute(
            f"SELECT {', '.join(got_cols)} FROM got_df").fetchall())
        try:
            exp_df = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
            n_bad += 1
            continue
        exp_cols = sorted(exp_df.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
            continue
        exp = table(con.execute(
            f"SELECT {', '.join(exp_cols)} FROM exp_df").fetchall())
        if got == exp:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            diff_g = [r for r in got if r not in set(exp)][:3]
            diff_e = [r for r in exp if r not in set(got)][:3]
            for r in diff_g:
                print(f"  spark-only: {r[:300]}")
            for r in diff_e:
                print(f"  duck-only:  {r[:300]}")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main())
