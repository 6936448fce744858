#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `graft.Verify` wrote: one parquet dir per query
plus oracle_sql.json. For each oracle entry, runs the SQL in DuckDB
against views over the sfDir parquet tables and compares with the
Spark result: columns sorted by name, rows sorted by all columns,
exact value equality (with a float-closeness diagnostic when exact
fails).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # pandas reads parquet DATE as datetime.date objects while duckdb emits
    # Timestamps; the driver's compare treats DATE==DATE as equal (r02: s1/
    # p1/m2 green), so normalize dates to Timestamps before comparing.
    import datetime
    import numpy as np

    def to_tuple(x):
        if isinstance(x, (list, tuple, np.ndarray)):
            return tuple(to_tuple(e) for e in x)
        if isinstance(x, dict):
            return tuple(sorted((k, to_tuple(v)) for k, v in x.items()))
        return x

    for c in df.columns:
        if df[c].dtype == object:
            v = df[c].dropna()
            if len(v) > 0 and isinstance(v.iloc[0], datetime.date) \
                    and not isinstance(v.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
            elif len(v) > 0 and isinstance(
                    v.iloc[0], (list, np.ndarray, dict)):
                # arrays/structs: tuple-ize so multi-column row sort works
                df[c] = df[c].map(to_tuple)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first")
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def _both_na(a, b):
    try:
        return bool(pd.isna(a)) and bool(pd.isna(b))
    except (TypeError, ValueError):
        return False


def compare(name, spark_df, oracle_df):
    res = {"query": name}
    s, o = canon(spark_df), canon(oracle_df)
    res["rows_match"] = len(s) == len(o)
    res["schema_match"] = list(s.columns) == list(o.columns)
    res["spark_rows"], res["oracle_rows"] = len(s), len(o)
    if not res["schema_match"]:
        res["spark_cols"], res["oracle_cols"] = list(s.columns), list(o.columns)
    exact = res["rows_match"] and res["schema_match"]
    if exact:
        for col in s.columns:
            sv, ov = s[col].tolist(), o[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                # Strict: the driver hashes a string canonicalization, so
                # Decimal('8625.60') vs float 8625.6 must FAIL here even
                # though they compare numerically equal.
                if not cell_eq(a, b) or (not _both_na(a, b)
                                         and str(a) != str(b)):
                    exact = False
                    close = (isinstance(a, float) and isinstance(b, float)
                             and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12))
                    res.setdefault("diffs", []).append(
                        {"col": col, "row": i, "spark": repr(a),
                         "oracle": repr(b), "float_close": close})
                    if len(res["diffs"]) >= 5:
                        break
            if "diffs" in res and len(res["diffs"]) >= 5:
                break
    res["hash_match"] = exact
    return res


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            # pandas/pyarrow read (NOT duckdb): preserves Decimal objects and
            # timestamp units the way the driver's compare sees them —
            # duckdb would flatten DECIMAL to float64 and mask repr
            # mismatches (round-2 false PASS on w2/st1/st2/hourly).
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            bad += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            bad += 1
            continue
        r = compare(name, spark_df, oracle_df)
        if r["hash_match"]:
            print(f"PASS {name} ({r['spark_rows']} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: {json.dumps(r, default=str)[:2000]}")
            bad += 1
    print(f"== {ok} pass / {bad} fail")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
