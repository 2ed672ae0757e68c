import json, glob, duckdb, pandas as pd, numpy as np, sys
sfdir = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv)>2 else '/tmp/vout'
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:300]}"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))])
    try:
        w, g = canon(want), canon(got)
    except Exception as e:
        print(f"{name}: CANON ERROR {str(e)[:200]}"); fails += 1; continue
    ok_schema = list(w.columns) == list(g.columns)
    ok_rows = len(w) == len(g)
    ok_vals = False
    dtype_note = ""
    if ok_schema and ok_rows:
        # strict value check; also flag float-vs-int dtype drift (the
        # driver hash is sensitive to HUGEINT->float64 widening)
        for c in w.columns:
            wk, gk = w[c].dtype.kind, g[c].dtype.kind
            if (wk in 'fcO') != (gk in 'fcO'):
                dtype_note += f" [dtype {c}: oracle={w[c].dtype} spark={g[c].dtype}]"
        try:
            pd.testing.assert_frame_equal(w, g, check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH\n{str(e)[:400]}")
    status = "OK" if (ok_schema and ok_rows and ok_vals and not dtype_note) else "FAIL"
    if status == "FAIL": fails += 1
    print(f"{name}: {status} schema={ok_schema} rows={ok_rows}({len(w)}/{len(g)}) values={ok_vals}{dtype_note}")
print(f"TOTAL FAILS: {fails}")
