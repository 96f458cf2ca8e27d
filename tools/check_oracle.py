#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's t2 gate): run each oracle SQL in
DuckDB over the fixture parquet tables and compare with the Verify.scala
parquet dumps — columns sorted by name, rows sorted, exact value compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <out>"` first.)

NOT part of the shipped library — the Scala engine has no Python deps.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_family(df: pd.DataFrame, c: str) -> str:
    """Coarse per-column type family for the driver-predictive dtype gate.
    The driver's hash is type-sensitive (DuckDB HUGEINT reaches pandas as
    float64, Spark BIGINT as int64 — same values, different hash), so an
    int-vs-float column divergence must FAIL here even when every value
    compares equal numerically."""
    dt = df[c].dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    # object column: classify by the first non-null python value
    s = df[c]
    for v in s:
        try:
            if v is None or (not isinstance(v, (list, tuple, dict)) and pd.isna(v)):
                continue
        except (TypeError, ValueError):
            pass
        import decimal
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        if isinstance(v, dict):
            return "struct"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "array"
        return type(v).__name__
    return "null"  # entirely-null column: compatible with anything


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    if str(type(a)) != str(type(b)) and not isinstance(a, type(b)) and not isinstance(b, type(a)):
        # allow numeric cross-type (int64 vs int32, Decimal vs Decimal)
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            pass
    return a == b


def main():
    # optional 3rd arg: a path to ALSO write a driver-shaped JSON record
    # ({query: {rows_match, schema_match, hash_match, spark_rows,
    # oracle_rows, err}}) — the committed CORRECTNESS artifact format
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    record = {}

    def rec(name, rows_match=False, schema_match=False, hash_match=False,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; amplified fixtures
        # (ScaleSmoke --amplify) are Spark-written directories
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = norm(con.sql(sql).df())
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            rec(name, err=f"load/exec error: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expected.columns)}")
            rec(name, rows_match=len(expected) == len(got),
                spark_rows=len(got), oracle_rows=len(expected),
                err="schema mismatch")
            n_fail += 1
            continue
        if len(expected) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expected)}")
            rec(name, schema_match=True, spark_rows=len(got),
                oracle_rows=len(expected), err="row count mismatch")
            n_fail += 1
            continue
        # driver-predictive dtype-family gate: the driver hashes typed
        # values, so int-vs-float (HUGEINT!) or decimal-vs-double columns
        # diverge there even when numerically equal here.
        fam_bad = None
        for c in expected.columns:
            fe, fg = dtype_family(expected, c), dtype_family(got, c)
            if fe != fg and "null" not in (fe, fg):
                fam_bad = (c, fe, fg)
                break
        if fam_bad:
            c, fe, fg = fam_bad
            print(f"FAIL {name}: col {c} dtype family: oracle={fe} got={fg}")
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(expected),
                err=f"dtype family mismatch col {c}: oracle={fe} spark={fg}")
            n_fail += 1
            continue
        # NB: column-first indexing (df[c].iloc[i]) everywhere below —
        # row-first (df.iloc[i][c]) builds a row Series that upcasts
        # mixed int/float rows to a common dtype, erasing exactly the
        # per-column type divergence the strict checks exist to catch.
        bad = None
        for i in range(len(expected)):
            for c in expected.columns:
                if not values_equal(expected[c].iloc[i], got[c].iloc[i]):
                    bad = (i, c, expected[c].iloc[i], got[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, e, g = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={e!r} ({type(e).__name__}) "
                  f"got={g!r} ({type(g).__name__})")
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(expected),
                err=f"value mismatch at row {i} col {c}")
            n_fail += 1
            continue
        # strict hash-style check (mirrors the driver's hash_match): cell
        # repr AND python type must agree — Decimal('1.00') vs 1.0 fails
        # here even though values_equal accepts it.
        # Integer WIDTH is driver-neutral (Spark INT vs DuckDB BIGINT both
        # hash as the integer value) — canonicalize numpy ints/bools to
        # python natives so only genuine type-family or value divergence
        # (int-vs-float, Decimal-vs-float, repr drift) fails.
        def canon(x):
            import numpy as np
            if isinstance(x, np.bool_):
                return bool(x)
            if isinstance(x, np.integer):
                return int(x)
            if isinstance(x, np.float64):
                return float(x)
            return x
        strict_bad = None
        for i in range(len(expected)):
            for c in expected.columns:
                e, g = canon(expected[c].iloc[i]), canon(got[c].iloc[i])
                try:
                    both_na = pd.isna(e) and pd.isna(g)
                except (TypeError, ValueError):
                    both_na = False
                if both_na:
                    continue
                if type(e) is not type(g) or repr(e) != repr(g):
                    strict_bad = (i, c, e, g)
                    break
            if strict_bad:
                break
        if strict_bad:
            i, c, e, g = strict_bad
            print(f"HASHFAIL {name}: row {i} col {c}: oracle={e!r} ({type(e).__name__}) "
                  f"got={g!r} ({type(g).__name__})")
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(expected),
                err=f"hash mismatch at row {i} col {c}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expected)} rows)")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(got), oracle_rows=len(expected))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
