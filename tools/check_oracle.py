#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB on each
oracle_sql.json entry over the sf parquet tables and diff against the
Spark parquet outputs written by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c, _ in sorted(zip(cols, order))] and sorted(cols), out

def main(sf, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        try:
            s = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            fail += 1
            continue
        oc, orc = rows_canon(ocols, orows)
        sc, src = rows_canon(scols, srows)
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            fail += 1
        elif orc != src:
            print(f"FAIL {name}: rows differ (spark={len(src)}, oracle={len(orc)})")
            both = set(orc) ^ set(src)
            shown = 0
            for r in orc:
                if r in both and shown < 3:
                    print(f"  oracle-only: {r}")
                    shown += 1
            shown = 0
            for r in src:
                if r in both and shown < 3:
                    print(f"  spark-only:  {r}")
                    shown += 1
            fail += 1
        else:
            print(f"OK   {name} ({len(src)} rows)")
            ok += 1
    # rows-only queries (no oracle): just check non-empty output exists
    import os
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS {d} ({n} rows, no oracle)")
                skip += 1
            except Exception as e:
                print(f"FAIL {d}: rows-only output unreadable: {e}")
                fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
