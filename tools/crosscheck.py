#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

Loads every parquet table in sfDir as a DuckDB view, runs each SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
exact match for non-floats, and reports max abs diff for floats.
"""
import json
import math
import sys
import glob
import os

import duckdb


def canon(rows, cols):
    # sort columns by name, then sort rows by string repr
    import decimal
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(float(r[i]) if isinstance(r[i], decimal.Decimal) else r[i]
                 for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # driver testdata is one file per table; graft.ScaleUp output is a
        # Spark-style directory of part files — support both layouts
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            oc = con.execute(sql)
            o_cols = [d[0] for d in oc.description]
            o_rows = oc.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        sc = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols = [d[0] for d in sc.description]
        s_rows = sc.fetchall()
        o_canon, o_c = canon(o_rows, o_cols)
        s_canon, s_c = canon(s_rows, s_cols)
        if o_c != s_c:
            print(f"[FAIL] {name}: schema mismatch spark={s_c} oracle={o_c}")
            n_fail += 1
            continue
        if len(o_canon) != len(s_canon):
            print(f"[FAIL] {name}: rows spark={len(s_canon)} oracle={len(o_canon)}")
            n_fail += 1
            continue
        bad = None
        max_float_diff = 0.0
        for rs, ro in zip(s_canon, o_canon):
            for vs, vo in zip(rs, ro):
                if isinstance(vs, float) or isinstance(vo, float):
                    if vs is None or vo is None:
                        if vs is not vo:
                            bad = (rs, ro)
                            break
                    else:
                        d = abs(vs - vo)
                        max_float_diff = max(max_float_diff, d)
                        if not (vs == vo or d <= 1e-12 * max(1.0, abs(vo))):
                            bad = (rs, ro)
                            break
                elif vs != vo:
                    bad = (rs, ro)
                    break
            if bad:
                break
        if bad:
            print(f"[FAIL] {name}: value mismatch\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
        else:
            extra = f" (max float diff {max_float_diff:.2e})" if max_float_diff else ""
            print(f"[ok] {name}: {len(s_canon)} rows{extra}")
            n_pass += 1
    print(f"== {n_pass} ok / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
