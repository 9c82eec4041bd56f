#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Runs each oracle SQL from <out>/oracle_sql.json in DuckDB over the sf
tables, loads the Spark result parquet written by graft.Verify, normalizes
both (sort columns by name, round floats, canonical row sort), and
reports per-query match/mismatch. Dev-only tool; not part of the library.

STRICT by default: after the rounding normalization, every value is
formatted to a string and compared exactly — this preserves the
int-vs-float distinction (int64 134 -> "134", float64 134.0 -> "134.0"),
reproducing the driver's formatted-value hash. An uncast DuckDB window
sum (HUGEINT -> pandas float64) therefore FAILS here exactly as it fails
the driver. Pass --tolerant for the old rtol-based numeric comparison
(triage only; it is leniently wrong where the driver is strict).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame, sort: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "f":
            df[c] = df[c].round(6)
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if not sort:  # strict mode sorts AFTER formatting, in fmt()
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def kind_class(dt) -> str:
    # Only int-vs-float matters for the audit: within-class width changes
    # (int32 vs int64) format identically, and everything else is caught by
    # the exact string compare.
    if dt.kind in "iub":
        return "int"
    if dt.kind == "f":
        return "float"
    return dt.kind

def fmt(df: pd.DataFrame) -> pd.DataFrame:
    # Driver-equivalent: hash/compare FORMATTED values. astype(str) on a
    # float64 column renders "134.0" where int64 renders "134" — the exact
    # distinction the driver's hash sees. Row-sort on the formatted values
    # so equal frames land in identical canonical order.
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)

def main():
    tolerant = "--tolerant" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    spark_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out}/*/")}
    n_ok = n_bad = 0
    for name in sorted(spark_dirs):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        sdf = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            if len(sdf) > 0:
                print(f"ok?  {name}: ROWS-ONLY rows={len(sdf)} (no oracle)")
            else:
                print(f"FAIL {name}: EMPTY rows-only result"); n_bad += 1
            continue
        try:
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        a, b = norm(sdf, sort=tolerant), norm(ddf, sort=tolerant)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1; continue
        if a.shape != b.shape:
            print(f"FAIL {name}: shape spark={a.shape} duck={b.shape}"); n_bad += 1; continue
        # Standing dtype-kind audit: an oracle OUTPUT column that comes back
        # float where Spark emits integer (DuckDB HUGEINT->float64 widening)
        # is the exact class that slipped the lenient gate in round 9.
        if not tolerant:
            kind_bad = [c for c in a.columns
                        if kind_class(a[c].dtype) != kind_class(b[c].dtype)
                        and {kind_class(a[c].dtype), kind_class(b[c].dtype)} == {"int", "float"}]
            if kind_bad:
                print(f"FAIL {name}: dtype-kind mismatch (int vs float) cols={kind_bad} "
                      f"spark={[str(a[c].dtype) for c in kind_bad]} "
                      f"duck={[str(b[c].dtype) for c in kind_bad]} — CAST the oracle column")
                n_bad += 1; continue
        try:
            if tolerant:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, rtol=1e-9, atol=1e-9)
            else:
                fa, fb = fmt(a), fmt(b)
                neq = (fa != fb)
                if neq.any().any():
                    bad_cols = [c for c in fa.columns if neq[c].any()]
                    c0 = bad_cols[0]
                    i0 = int(neq[c0].idxmax())
                    raise AssertionError(
                        f"formatted values differ in cols={bad_cols}; first at "
                        f"[{i0}][{c0}]: spark='{fa[c0].iloc[i0]}' duck='{fb[c0].iloc[i0]}'")
            print(f"OK   {name}: rows={len(a)}"); n_ok += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:3]
            print(f"FAIL {name}: {' | '.join(msg)}"); n_bad += 1
    missing = set(oracle) - spark_dirs
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no spark output"); n_bad += 1
    # Verify writes _errors.json with every thrown query (even ones with no
    # oracle) — surface those as FAIL instead of letting them vanish.
    try:
        errors = json.load(open(f"{out}/_errors.json"))
    except FileNotFoundError:
        errors = {}
    except json.JSONDecodeError as e:
        # A truncated/corrupt errors file (Verify killed mid-write) is
        # itself a gate failure, not a crash.
        print(f"FAIL _errors.json: corrupt ({e})"); n_bad += 1
        errors = {}
    for name in sorted(set(errors) - missing):
        print(f"FAIL {name}: verify threw: {errors[name][:200]}"); n_bad += 1
    print(f"\n{n_ok} OK, {n_bad} FAIL, {len(spark_dirs) - n_ok - n_bad} rows-only")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
