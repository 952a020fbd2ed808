#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and compare (sorted columns, sorted rows).

Usage: python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pq = os.path.join(outdir, name)
        if not glob.glob(pq + "/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{pq}/*.parquet'").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
