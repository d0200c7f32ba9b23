#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query dir in
outDir, read the Spark parquet result and run the oracle SQL in DuckDB over
the same sf tables, sort columns by name and rows by value, and diff.

Usage: python3 tools/compare.py <outDir> <sfDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def key(row):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        try:
            orows = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        srows = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchall()
        scols = [d[0] for d in con.description]
        # sort columns by name
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        o = sorted((tuple(norm(r[i]) for i in oidx) for r in orows), key=key)
        s = sorted((tuple(norm(r[i]) for i in sidx) for r in srows), key=key)
        cols_ok = sorted(ocols) == sorted(scols)
        if cols_ok and o == s:
            print(f"{name}: PASS rows={len(s)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: FAIL cols_ok={cols_ok} spark_rows={len(s)} oracle_rows={len(o)}")
            if not cols_ok:
                print(f"  spark cols={sorted(scols)} oracle cols={sorted(ocols)}")
            so, ss = set(o), set(s)
            extra = sorted(ss - so, key=key)[:5]
            missing = sorted(so - ss, key=key)[:5]
            if extra:
                print(f"  spark-only rows: {extra}")
            if missing:
                print(f"  oracle-only rows: {missing}")
    print(f"== {n_pass} pass / {n_fail} fail ==")


if __name__ == "__main__":
    main()
