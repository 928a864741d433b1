#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: local_verify.py <sfDir> <outDir> [query_filter_substring]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB over views named after
the fixture tables, sorts columns by name + rows by all columns, and compares
exactly. Dev-only tool — NOT part of the shipped Scala library.
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    filt = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if filt and filt not in name:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            n_fail += 1
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got = canon(duckdb.sql(
            f"SELECT * FROM read_parquet({files!r})").df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                ga = g.astype(float).to_numpy()
                ea = e.astype(float).to_numpy()
                eq = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[row{i}]: spark={ga[i]!r} duck={ea[i]!r} "
                               f"diff={abs(ga[i]-ea[i]):.3e}")
            else:
                ge = g.astype(str).to_numpy()
                ee = e.astype(str).to_numpy()
                eq = ge == ee
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[row{i}]: spark={g.iloc[i]!r} "
                               f"duck={e.iloc[i]!r} "
                               f"(dtype {g.dtype} vs {e.dtype})")
        # dtype sanity (driver may compare schemas): warn, don't fail
        for c in got.columns:
            if got[c].dtype != exp[c].dtype:
                print(f"  WARN {name}.{c}: dtype spark={got[c].dtype} "
                      f"duck={exp[c].dtype}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
