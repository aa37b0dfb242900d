#!/usr/bin/env python3
"""Structural sf-scale validator for t_binpack (next-fit-decreasing
whole-document bin packing).

The graded DuckDB oracle replays the per-shard NFD walk as a recursive
CTE — exact, but oracle-INTRACTABLE past sf1 (the recursion is one step
per document per shard; sf5's 2.5M docs = millions of sequential
recursion steps in one thread). The NFD assignment is, however,
UNIQUELY determined by four relational invariants given the input and
the (tok DESC, doc_id) shard order, so validating those invariants
against the dumped output IS an exact replay — every check is a
hash-join/window over the frame, no recursion:

  I1 row parity: exactly the non-null documents appear, once each, with
     shard = doc_id % nShards and n_tok = the whitespace token count;
  I2 the first doc of every shard (tok DESC, doc_id) opens bin 1;
  I3 along shard order, bin_id never decreases and steps by at most 1;
  I4a within-bin totals never exceed cap, except a single oversized doc
      alone in its bin (never dropped, never split);
  I4b every +1 step was FORCED: the previous bin's total plus the
      stepping doc's tokens exceeds cap.

(I2-I4 admit exactly one assignment per shard order: induction on rank —
each doc's bin is determined by the previous doc's bin and the fit test.)

Usage: binpack_validate.py <sf_dir> <t_binpack_dump_dir> [cap] [nshards]
Prints one line per invariant; exits 1 on any violation.
"""
import os
import sys

import duckdb

def main():
    sf, dump = sys.argv[1], sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    nsh = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    docs = f"{sf}/documents.parquet"
    if os.path.isdir(docs):  # ScaleGen writes a directory of part files
        docs = f"{docs}/*.parquet"
    con = duckdb.connect()
    con.execute(f"""
      CREATE VIEW o AS SELECT doc_id, shard, bin_id, n_tok
        FROM read_parquet('{dump}/*.parquet');
      CREATE VIEW d AS SELECT doc_id, doc_id % {nsh} AS shard,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok
        FROM read_parquet('{docs}') WHERE doc_id IS NOT NULL;
    """)
    fails = 0
    def check(name, sql):
        nonlocal fails
        n = con.execute(sql).fetchone()[0]
        ok = "OK  " if n == 0 else "FAIL"
        if n != 0:
            fails += 1
        print(f"{ok} {name}: {n} violations")

    check("I1 row parity (doc set, shard, n_tok)", """
      SELECT count(*) FROM o FULL JOIN d USING (doc_id)
      WHERE o.doc_id IS NULL OR d.doc_id IS NULL
         OR o.shard <> d.shard OR o.n_tok <> d.tok""")
    con.execute("""
      CREATE VIEW w AS SELECT *,
        row_number() OVER s AS rn, lag(bin_id) OVER s AS pbin,
        sum(n_tok) OVER (PARTITION BY shard, bin_id
                         ORDER BY n_tok DESC, doc_id) AS cum_in_bin,
        count(*) OVER (PARTITION BY shard, bin_id) AS bin_n
      FROM o WINDOW s AS (PARTITION BY shard ORDER BY n_tok DESC, doc_id)""")
    check("I2 first doc of each shard opens bin 1",
          "SELECT count(*) FROM w WHERE rn = 1 AND bin_id <> 1")
    check("I3 bin steps by 0 or +1 along shard order", """
      SELECT count(*) FROM w
      WHERE pbin IS NOT NULL AND bin_id NOT IN (pbin, pbin + 1)""")
    check("I4a in-bin totals bounded by cap (oversized = alone)", f"""
      SELECT count(*) FROM w
      WHERE cum_in_bin > {cap} AND NOT (bin_n = 1 AND n_tok > {cap})""")
    check("I4b every new bin was forced (prev bin + doc > cap)", f"""
      WITH binsum AS (SELECT shard, bin_id, sum(n_tok) AS tot
                      FROM o GROUP BY 1, 2)
      SELECT count(*) FROM w JOIN binsum b
        ON b.shard = w.shard AND b.bin_id = w.bin_id - 1
      WHERE w.pbin IS NOT NULL AND w.bin_id = w.pbin + 1
        AND b.tot + w.n_tok <= {cap}""")
    n, bins = con.execute(
        "SELECT count(*), count(DISTINCT (shard, bin_id)) FROM o").fetchone()
    print(f"== {n} docs in {bins} bins; {'PASS' if fails == 0 else 'FAIL'}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
