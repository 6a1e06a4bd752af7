#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL on the same testdata tables and compare
(schema-insensitively: columns sorted by name, rows sorted, values compared
with exact equality; floats compared bitwise after float64 cast)."""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            a, b = g[c], w[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                import numpy as np
                aa, bb = a.astype("float64").values, b.astype("float64").values
                same = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                if not same.all():
                    bad = (~same).nonzero()[0][:3]
                    print(f"FAIL {name}: col {c} diff at rows {bad.tolist()} got={aa[bad]} want={bb[bad]}")
                    ok = False; break
            else:
                if not a.astype(str).equals(b.astype(str)):
                    diff = (a.astype(str) != b.astype(str))
                    bad = diff[diff].index[:3].tolist()
                    print(f"FAIL {name}: col {c} diff at rows {bad} got={a[bad].tolist()} want={b[bad].tolist()}")
                    ok = False; break
        if ok: print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else: n_fail += 1
    # rows-only queries
    declared = set(oracle)
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res_dir.rstrip("/"))
        if name in declared: continue
        files = glob.glob(f"{res_dir}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} [rows-only] ({n} rows)")
        if n > 0: n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
