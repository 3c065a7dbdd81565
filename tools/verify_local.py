#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check.

Usage: verify_local.py [--scale] <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, and compares
with the Spark result parquet at <verifyOutDir>/<name>/. Column order is
normalized by sorting column names; row order by sorting all rows.

--scale (used by verify_sweep.py at tiers above the driver gate) swaps
the deliberately-exhaustive oracle blocks for value-identical efficient
forms via scale_oracles.rewrite — see that module. The sf0.01 driver
gate never passes the flag, so the exhaustive oracles stay the gate.
"""
import duckdb, glob, json, os, sys

import pandas as pd

def main():
    argv = [a for a in sys.argv[1:] if a != "--scale"]
    scale = "--scale" in sys.argv[1:]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).removesuffix(".parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if scale:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import scale_oracles
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if scale:
            sql = scale_oracles.rewrite(con, oracle, name)
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_glob}'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        dt_got, dt_want = list(got.dtypes), list(want.dtypes)
        if dt_got != dt_want:
            print(f"WARN {name}: dtypes {dt_got} vs {dt_want}")
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        ws = want.sort_values(by=list(want.columns), ignore_index=True)
        if len(gs) != len(ws):
            print(f"FAIL {name}: rows {len(gs)} != {len(ws)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(gs, ws, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(gs)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            diff = (gs != ws) & ~(gs.isna() & ws.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  first diff row {i}:\n  spark: {gs.loc[i].to_dict()}\n  duck : {ws.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
