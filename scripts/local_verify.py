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
import math
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_lint(v) -> str:
    """Driver-hash-safety lint for a single cell.

    The driver md5-hashes rendered cells; a DECIMAL wider than 18 digits or
    a float past the 2^53 exact-integer range renders differently between
    Spark's parquet decimals and DuckDB's pandas conversion (this is how
    q43 shipped red in rounds 6-8 while this script said green). Returns an
    error string, or "".
    """
    if isinstance(v, Decimal):
        if len(v.as_tuple().digits) > 18:
            return f"decimal wider than 18 digits: {v}"
        if not float_exact(v):
            # DuckDB's .df() renders DECIMAL via float64; a value that does
            # not round-trip float64 exactly renders differently there than
            # Spark's parquet Decimal does (q43's failure mode: 6.3e17 is
            # 18 digits — BIGINT-safe — but past the 2^53 exact range).
            return f"decimal past float64-exact range: {v}"
    elif isinstance(v, float):
        if not math.isnan(v) and abs(v) >= 2.0 ** 53:
            return f"float past exact-integer range: {v!r}"
    elif isinstance(v, (int, np.integer)):
        if not (-2 ** 63 <= int(v) < 2 ** 63):
            return f"integer past BIGINT range: {v}"
    return ""


def render(v) -> str:
    """Canonical per-engine cell rendering for cross-kind compares — the
    model of the driver's md5-over-rendered-cells: each side renders with
    its own type's natural form (float64 repr vs Decimal/int str), so
    Decimal('0.10') vs float 0.1 ('0.10' vs '0.1') and int 3 vs float 3.0
    ('3' vs '3.0') are DIVERGENT even though numerically equal."""
    if isinstance(v, float):
        return repr(v)
    return str(v)


def float_exact(v) -> bool:
    """True iff v survives a round-trip through float64 unchanged — the
    precondition for comparing a non-float column against a float column
    (DuckDB's .df() renders DECIMAL as float64)."""
    if v is None:
        return True
    if isinstance(v, float):
        return True
    if isinstance(v, Decimal):
        try:
            return Decimal(repr(float(v))) == v
        except (ValueError, OverflowError):
            return False
    if isinstance(v, (int, np.integer)):
        return abs(int(v)) < 2 ** 53
    return False


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
            rel = con.sql(sql)
            # Oracle-side decimal ban, checked on the RELATION types before
            # .df(): DuckDB's .df() converts every DECIMAL to float64, so a
            # fractional oracle DECIMAL (e.g. DECIMAL(20,10)) would silently
            # take the float-float path below — the same rendering-divergence
            # class that masked q43, just on the oracle side. The driver
            # hashes DuckDB's own DECIMAL rendering, not float64's.
            odec = [c for c, t in zip(rel.columns, rel.types)
                    if "DECIMAL" in str(t).upper()]
            if odec:
                print(f"FAIL {name}: LINT oracle DECIMAL column(s) {odec} — "
                      f"cast to DOUBLE/BIGINT in oracleSql (driver hashes "
                      f"DuckDB's decimal rendering, .df() hides it as float64)")
                n_fail += 1
                continue
            exp = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # Schema-level decimal ban, checked on the RAW parquet schema: both
        # compare sides below go through DuckDB .df(), which converts every
        # DECIMAL to float64 before the cell lints can see it — a Spark
        # decimal output would be invisible here yet render divergently in
        # the driver's canonicalizer (the q43 failure class). The repo
        # convention is decimals never surface (doubles via Ora.dsum/davg).
        import pyarrow.parquet as pq
        dec_cols = [f.name for f in pq.read_schema(files[0])
                    if "decimal" in str(f.type)]
        if dec_cols:
            print(f"FAIL {name}: LINT decimal output column(s) {dec_cols} — "
                  f"driver hash renders Spark decimals vs DuckDB divergently")
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
            # Hash-safety lint first: values the driver's canonicalization
            # can render divergently fail even if they compare equal here.
            for side, s in (("spark", g), ("duck", e)):
                for i, v in enumerate(s):
                    err = cell_lint(v)
                    if err:
                        bad.append(f"{c}[row{i}] {side} LINT: {err}")
                        break
            gf, ef = g.dtype.kind == "f", e.dtype.kind == "f"
            if gf and ef:
                ga = g.to_numpy(dtype=float)
                ea = e.to_numpy(dtype=float)
                eq = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[row{i}]: spark={ga[i]!r} duck={ea[i]!r} "
                               f"diff={abs(ga[i]-ea[i]):.3e}")
            elif gf or ef:
                # Mixed kinds (e.g. Spark parquet Decimal vs DuckDB float64
                # from DECIMAL): the driver hashes each side's own rendering,
                # so require RENDERING equality, not numeric equality —
                # coercing both to float here is what hid q43 for three
                # rounds, and numeric Decimal equality would still hide
                # scale divergence like '0.10' vs '0.1'.
                for i, (gv, ev) in enumerate(zip(g, e)):
                    gn = gv is None or (isinstance(gv, float) and math.isnan(gv))
                    en = ev is None or (isinstance(ev, float) and math.isnan(ev))
                    if gn or en:
                        if gn != en:
                            bad.append(f"{c}[row{i}]: spark={gv!r} duck={ev!r}")
                            break
                        continue
                    if render(gv) != render(ev):
                        bad.append(
                            f"{c}[row{i}]: mixed dtype ({g.dtype} vs {e.dtype}) "
                            f"renders divergently: spark={render(gv)!r} "
                            f"duck={render(ev)!r} — driver hash would diverge")
                        break
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
