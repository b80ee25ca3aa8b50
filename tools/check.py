#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate: run each
oracle SQL in DuckDB over the sf parquet tables and compare (sorted
columns, sorted rows, float tolerance) against the Verify parquet dump.
Usage: python3 tools/check.py <sfdir> <outdir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                rr.append(round(v, 6) if math.isfinite(v) else str(v))
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in idx], out

def close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
    except (ValueError, TypeError):
        return False

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        try:
            exp = con.execute(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: cols {gc} != {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); n_fail += 1; continue
        bad = None
        for rg, re_ in zip(gr, er):
            if rg != re_ and not all(close(a, b) for a, b in zip(rg, re_)):
                bad = (rg, re_); break
        if bad:
            print(f"FAIL {name}: row mismatch\n  spark={bad[0]}\n  duck ={bad[1]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
