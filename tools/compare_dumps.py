#!/usr/bin/env python3
"""Canon-compare two graft.Verify output directories query by query.

The config-robustness matrix's workhorse: the DEFAULT-config dump is
oracle-checked by tools/check.py (DuckDB replay); every adversarial-config
dump is then compared against the default dump with the SAME value
normalization check.py uses (%.10g floats, sorted columns, sorted rows).
A query that is hash-exact vs the oracle at default AND canon-identical
across configs is oracle-exact under every config — without re-running
the heavy DuckDB replays per config.

Approximate/order-dependent queries with no oracle (the documented
q_sketch / st_neardup class) are compared too: they are deterministic
under a fixed config but MAY legitimately differ across configs
(partitioning-dependent tie-breaks); pass --allow to exempt them and the
report lists them separately rather than failing.

Usage: python3 tools/compare_dumps.py <baseDir> <otherDir> [--allow q1,q2]
"""
import math
import os
import sys

import pandas as pd


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "tolist"):
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


def canon(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(norm_cell(v) for v in row)
                  for row in df.itertuples(index=False))


def main():
    base_dir, other_dir = sys.argv[1], sys.argv[2]
    allow = set()
    if "--allow" in sys.argv:
        allow = set(sys.argv[sys.argv.index("--allow") + 1].split(","))
    names = sorted(d for d in os.listdir(base_dir)
                   if os.path.isdir(os.path.join(base_dir, d)))
    n_pass = n_fail = 0
    allowed_diff = []
    for name in names:
        other = os.path.join(other_dir, name)
        if not os.path.isdir(other):
            print(f"FAIL {name}: missing in {other_dir}")
            n_fail += 1
            continue
        try:
            a = canon(pd.read_parquet(os.path.join(base_dir, name)))
            b = canon(pd.read_parquet(other))
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
            continue
        if a == b:
            n_pass += 1
        elif name in allow:
            allowed_diff.append(name)
            print(f"ALLOW {name}: differs across configs "
                  f"({len(a)} vs {len(b)} rows) — documented "
                  f"config-dependent query")
        else:
            n_fail += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}; "
                  f"{len(diff)} differing; first: "
                  f"{diff[0] if diff else '(row count only)'}")
    print(f"== {n_pass} identical, {n_fail} fail, "
          f"{len(allowed_diff)} allowed-different ({','.join(allowed_diff)})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
