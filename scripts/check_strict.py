#!/usr/bin/env python3
"""Bit-faithful local replica of the driver's correctness compare.

Unlike check.py (pandas, check_dtype=False, str() laundering), this
canonicalizes each cell to an exact, type-faithful token:
  - floats      -> IEEE bit pattern (hex)  [bit-exact or fail]
  - decimals    -> str(Decimal) WITH scale (so 1.50 != 1.5)
  - timestamps  -> epoch nanoseconds int
  - ints/bools  -> repr
  - strings     -> verbatim
Rows are sorted as token tuples; the two multisets must be identical.

Usage: python3 scripts/check_strict.py /tmp/verify_out /root/testdata/sf0.01 [query ...]
"""
import sys, json, glob, os, struct
from decimal import Decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def cell_at(col, r, typ):
    v = col[r]
    if not v.is_valid:
        return "\x00NULL"
    if pa.types.is_floating(typ):
        return "f:" + struct.pack(">d", v.as_py()).hex()
    if pa.types.is_decimal(typ):
        return "d:" + str(v)          # pyarrow renders with full scale
    if pa.types.is_timestamp(typ):
        mult = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[typ.unit]
        return "t:" + str(v.value * mult)
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        vals = v.values
        return "[" + ",".join(cell_at(vals, i, typ.value_type)
                              for i in range(len(vals))) + "]"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return "b:" + v.as_py().hex()
    return repr(v.as_py())

def canon_rows(tbl: pa.Table):
    tbl = tbl.select(sorted(tbl.column_names))
    cols = [tbl.column(i).combine_chunks() for i in range(tbl.num_columns)]
    typs = [f.type for f in tbl.schema]
    rows = [tuple(cell_at(cols[c], r, typs[c]) for c in range(tbl.num_columns))
            for r in range(tbl.num_rows)]
    rows.sort()
    return tbl.column_names, [str(t) for t in typs], rows

def main(outdir, sfdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        pq_dir = os.path.join(outdir, name)
        files = glob.glob(pq_dir + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got_t = pq.read_table(pq_dir)
            exp_t = con.sql(oracles[name]).arrow()
            if hasattr(exp_t, "read_all"):
                exp_t = exp_t.read_all()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, gt, grows = canon_rows(got_t)
        ec, et, erows = canon_rows(exp_t)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if gt != et:
            print(f"WARN {name}: dtypes spark={gt} oracle={et}")
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}"); n_fail += 1; continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if not diffs:
            print(f"PASS {name} ({len(grows)} rows, types {'EXACT' if gt==et else 'DIFFER'})")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(grows)}; cols={gc}")
            for i, a, b in diffs[:5]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
