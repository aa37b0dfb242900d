#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt runMain graft.Verify <sfDir> <outDir>`: for each query,
reads the Spark parquet output and the DuckDB result of the oracle SQL
(tables registered as views over the same sf dir), sorts columns by name
and rows by all columns, and compares values.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0 display only; engines should not emit -0
        return f"{v:.10g}"
    if hasattr(v, "tolist"):  # numpy arrays from list columns
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of part files
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # fidelity to the driver's harness: it sorts the RAW frame with
        # pandas sort_values, which throws on array/struct cells. Our
        # canon() stringifies first and would mask that — replicate the
        # driver's sort so an unsortable output FAILS here too (this is
        # what let the round-6 mm_features regression through locally).
        try:
            spark_df.sort_values(list(spark_df.columns))
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values would err: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} "
                  f"duck={sorted(duck_df.columns)}")
            n_fail += 1
            continue
        # the driver's hash is dtype-sensitive (e.g. DuckDB HUGEINT sums load
        # as float/object while Spark writes int64): flag dtype drift even
        # when normalized values match, so it gets fixed with an oracle CAST.
        for c in sorted(spark_df.columns):
            sd, dd = str(spark_df[c].dtype), str(duck_df[c].dtype)
            if sd != dd:
                print(f"WARN {name}: dtype drift on '{c}': spark={sd} duck={dd}")
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        bad = [(x, y) for x, y in zip(a, b) if x != y]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(a)} rows differ; first: "
                  f"\n  spark={bad[0][0]}\n  duck ={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    # aux dumps carry no oracle but the driver still diffs (and sorts)
    # them — apply the same driver-style sortability check
    for d in sorted(os.listdir(out_dir)):
        if d in oracle or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        if only and d not in only:
            continue
        try:
            aux_df = pd.read_parquet(f"{out_dir}/{d}")
            aux_df.sort_values(list(aux_df.columns))
            print(f"PASS {d} (aux, sortable, {len(aux_df)} rows)")
        except Exception as e:
            print(f"FAIL {d}: aux dump unsortable/unreadable: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
