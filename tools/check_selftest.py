#!/usr/bin/env python3
"""Self-test for tools/check.py's comparison semantics.

The round-9 failure mode: DuckDB window-sums integers to HUGEINT, pandas
renders that float64, the driver hashes FORMATTED values ("134.0" vs
"134") and fails — while the old rtol-based local gate passed. This
self-test pins the strict mode to the driver's behavior so the checker
can never silently regress back to lenient:

  - int64 134 vs float64 134.0  -> strict FAIL, tolerant PASS
  - identical frames in any row order -> strict PASS
  - float values differing beyond round(6) -> both FAIL

Run: python3 tools/check_selftest.py  (exit 0 = checker semantics OK)
"""
import sys
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import norm, fmt, kind_class


def strict_equal(sdf: pd.DataFrame, ddf: pd.DataFrame) -> bool:
    """Replicates check.py's strict path: kind audit, then formatted compare."""
    a, b = norm(sdf, sort=False), norm(ddf, sort=False)
    if list(a.columns) != list(b.columns) or a.shape != b.shape:
        return False
    for c in a.columns:
        ks = {kind_class(a[c].dtype), kind_class(b[c].dtype)}
        if ks == {"int", "float"}:
            return False
    fa, fb = fmt(a), fmt(b)
    return not (fa != fb).any().any()


def main():
    fails = []

    def check(name, cond):
        (fails.append(name) if not cond else None)
        print(("ok  " if cond else "FAIL") + f" {name}")

    # 1. The r9 class: int64 vs float64, numerically equal.
    spark = pd.DataFrame({"day": ["d1", "d2"], "cum": pd.array([134, 200], dtype="int64")})
    duck = pd.DataFrame({"day": ["d1", "d2"], "cum": pd.array([134.0, 200.0], dtype="float64")})
    check("int-vs-float numerically-equal frames FAIL strict", not strict_equal(spark, duck))

    # 2. Identical frames in shuffled row order pass.
    a = pd.DataFrame({"k": ["x", "y", "z"], "v": pd.array([1, 2, 3], dtype="int64")})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)
    check("identical frames, shuffled rows PASS strict", strict_equal(a, b))

    # 3. Floats equal after round(6) pass; beyond it fail.
    f1 = pd.DataFrame({"v": [0.1234559999]})
    f2 = pd.DataFrame({"v": [0.1234560001]})
    check("floats equal post-round(6) PASS strict", strict_equal(f1, f2))
    f3 = pd.DataFrame({"v": [0.123457]})
    f4 = pd.DataFrame({"v": [0.123458]})
    check("floats differing post-round(6) FAIL strict", not strict_equal(f3, f4))

    # 4. Width-only integer changes (int32 vs int64) are NOT flagged.
    w1 = pd.DataFrame({"v": pd.array([7, 8], dtype="int32")})
    w2 = pd.DataFrame({"v": pd.array([7, 8], dtype="int64")})
    check("int32 vs int64 same values PASS strict", strict_equal(w1, w2))

    # 5. Nullable-int via float64-with-NaN on BOTH sides passes (duckdb
    #    fetchdf renders NULLs in integer columns that way symmetrically).
    n1 = pd.DataFrame({"v": [1.0, float("nan")]})
    n2 = pd.DataFrame({"v": [1.0, float("nan")]})
    check("symmetric NaN frames PASS strict", strict_equal(n1, n2))

    print(f"\n{len(fails)} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
