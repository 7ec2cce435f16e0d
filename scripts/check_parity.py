#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Usage: check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over <sfDir>'s parquet tables, then compares
rows/schema/values after sorting columns by name and rows by all columns —
the same normalization the driver applies before hashing.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            import glob
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(p) for p in files])
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        o, g = normalize(oracle), normalize(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(o.columns)}")
            n_fail += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(o)}")
            n_fail += 1
            continue
        # value compare with dtype coercion to string (like a hash of the
        # printed values); floats first rounded to kill representation noise
        mismatch = None
        for c in o.columns:
            oc, gc = o[c], g[c]
            if pd.api.types.is_float_dtype(oc) or pd.api.types.is_float_dtype(gc):
                oc = pd.to_numeric(oc, errors="coerce").round(6)
                gc = pd.to_numeric(gc, errors="coerce").round(6)
                eq = (oc.fillna(-1e308) == gc.fillna(-1e308)).all()
            else:
                eq = (oc.astype(str) == gc.astype(str)).all()
            if not eq:
                bad = (oc.astype(str) != gc.astype(str))
                i = bad[bad].index[0] if bad.any() else 0
                mismatch = (c, oc.iloc[i], gc.iloc[i])
                break
        if mismatch:
            c, ov, gv = mismatch
            print(f"FAIL {name}: col {c} oracle={ov!r} spark={gv!r}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(o)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
