#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the raw testdata parquet, compare to the Verify output parquet
(sorted columns, sorted rows, exact values). Usage:
    python3 tools/selfcheck.py <verifyOutDir> <sfDir>
"""
import duckdb, glob, json, math, os, sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no verify output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        gv, ev = got.to_numpy(dtype=object), exp.to_numpy(dtype=object)
        for i in range(len(gv)):
            for j in range(gv.shape[1]):
                if not cmp_cell(gv[i][j], ev[i][j]):
                    bad = (i, got.columns[j], gv[i][j], ev[i][j]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got={bad[2]!r} exp={bad[3]!r}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    extra = set(os.listdir(outdir)) - set(oracle) - {"oracle_sql.json"}
    extra = {e for e in extra if os.path.isdir(os.path.join(outdir, e))}
    for name in sorted(extra):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"INFO {name}: no oracle (rows-only check), {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(extra)} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
