#!/usr/bin/env python3
"""Driver-mimic correctness check (builder-side testing only, not part of
the engine). Runs DuckDB on SparkEntry.oracleSql against the testdata
tables and compares to the parquet dumps produced by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name1,name2,...]
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = only - set(oracle)
        if unknown:  # typo or rows-only query: a silent empty filter
            print(f"ERROR: no oracle entry for: {sorted(unknown)}")
            return 2
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        ok, msg = compare(got, want)
        if ok:
            print(f"ok   {name}: {len(got)} rows"); n_ok += 1
        else:
            print(f"FAIL {name}: {msg}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

def compare(got, want):
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        return False, f"columns {list(got.columns)} != {list(want.columns)}"
    if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
        return False, ("dtypes " + str(list(zip(got.columns, got.dtypes))) +
                       " != " + str(list(zip(want.columns, want.dtypes))))
    if len(got) != len(want):
        return False, f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y and not (x != x and y != y):  # NaN==NaN
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
