#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Empirically matched to the driver (round 1): Spark parquet is read with
pandas.read_parquet (pyarrow types: decimal -> object Decimal, int64),
the oracle runs in DuckDB and is materialized with .df() (DECIMAL/HUGEINT
-> float64), columns sorted by name, rows str()-canonicalized and sorted.
A Spark decimal column therefore NEVER matches a DuckDB numeric: emit
doubles (decimal internally for exact sums, cast at the end) or int64.

Usage: check_oracle.py <sfDir> <verifyOutDir> [only,names]
"""
import json, sys, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def df_canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

def main(sf, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        try:
            sdf = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: schema mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            fail += 1
            continue
        src, orc = df_canon(sdf), df_canon(odf)
        if src != orc:
            print(f"FAIL {name}: rows differ (spark={len(src)}, oracle={len(orc)})")
            for c in sorted(sdf.columns):
                sv = sorted(str(v) for v in sdf[c]); ov = sorted(str(v) for v in odf[c])
                if sv != ov:
                    d = next((a, b) for a, b in zip(sv, ov) if a != b) if len(sv) == len(ov) else (sv[0], ov[0])
                    print(f"   col {c}: spark_dtype={sdf[c].dtype} oracle_dtype={odf[c].dtype} first_diff={d}")
            fail += 1
        elif len(src) == 0:
            print(f"WARN {name}: EMPTY result (vacuous pass)")
            fail += 1
        else:
            print(f"OK   {name} ({len(src)} rows)")
            ok += 1
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {d} ({n} rows, no oracle)" if n else f"FAIL {d}: rows-only output EMPTY")
                skip += 1 if n else 0
                fail += 0 if n else 1
            except Exception as e:
                print(f"FAIL {d}: rows-only output unreadable: {e}")
                fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    return 1 if fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
