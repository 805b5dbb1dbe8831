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
import time
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


REACH_IDIOM = ("reach(root, node) AS (\n  SELECT a, a FROM und\n  UNION\n"
               "  SELECT r.root, u.b FROM reach r JOIN und u ON r.node = u.a)")


def uf_substitute(con, sql):
    """Replace the transitive-closure `reach` CTE with an exact union-find.

    In the full closure, reach(root, node) holds for every ordered pair in
    one connected component, so min(root) per node is the min node id of
    its component — which union-find over the same `und` edge list computes
    in O(E α(E)) instead of O(sum(component^2)). Exact, not approximate.
    """
    import re as _re
    if REACH_IDIOM not in sql:
        return sql
    left, right = sql.split(REACH_IDIOM)
    edges_sql = left.rstrip().rstrip(",") + "\nSELECT a, b FROM und"
    edges = con.execute(edges_sql).fetchall()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    rows = []
    for members in groups.values():
        m = min(members)
        rows.extend((n, m) for n in members)
    import pandas as pd
    con.register("cc_uf_view", pd.DataFrame(rows, columns=["node", "root_min"]))
    right = right.lstrip()
    if right.startswith(","):
        right = right[1:].lstrip()
    left = left.rstrip().rstrip(",")
    joiner = "\n" if right.upper().startswith("SELECT") else ",\n"
    new_sql = left + joiner + right
    new_sql = _re.sub(
        r"SELECT node AS (\w+), min\(root\) AS (\w+)\s+FROM reach GROUP BY node",
        r"SELECT node AS \1, root_min AS \2 FROM cc_uf_view",
        new_sql)
    assert "reach" not in new_sql, "unconsumed reach reference after uf substitution"
    return new_sql


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: --skip q26,q27 (documented-infeasible oracles at big SF),
    # --only q40,q41 (re-run a subset), --from q27 (resume a sweep),
    # --uf (substitute the O(component^2) transitive-closure `reach` CTE
    #        with an exact Python union-find over the same `und` edge
    #        list — equivalent because min(root) over the full closure
    #        is the min node id in the component; needed at sf>=1 where
    #        the recursive CTE materializes ~1e8+ pairs in DuckDB)
    skip, only, from_q, use_uf = set(), None, None, False
    for i, a in enumerate(sys.argv):
        if a == "--skip":
            skip = set(sys.argv[i + 1].split(","))
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
        if a == "--from":
            from_q = sys.argv[i + 1]
        if a == "--uf":
            use_uf = True
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # driver testdata is one file per table; graft.ScaleUp output is a
        # Spark-style directory of part files — support both layouts
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if name.split("_")[0] in skip or name in skip:
            print(f"[skip] {name}", flush=True)
            n_skip += 1
            continue
        if only is not None and name.split("_")[0] not in only and name not in only:
            continue
        if from_q is not None and name < from_q:
            continue
        t0 = time.time()
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            run_sql = uf_substitute(con, sql) if use_uf else sql
            if run_sql is not sql:
                print(f"[uf] {name}: reach CTE -> union-find", flush=True)
            oc = con.execute(run_sql)
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
            print(f"[ok] {name}: {len(s_canon)} rows{extra} [{time.time()-t0:.1f}s]",
                  flush=True)
            n_pass += 1
    print(f"== {n_pass} ok / {n_fail} fail / {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
