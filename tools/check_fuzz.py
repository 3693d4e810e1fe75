#!/usr/bin/env python3
"""Compare FuzzRunner parquet dumps against DuckDB on the same queries.

Usage: python3 tools/check_fuzz.py [sf_dir] [queries.json] [out_dir]
"""
import glob
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from check_correctness import canon, table_hash  # noqa: E402


def tolerant_equal(got, want):
    """Exact equality except FLOOR-quantized double aggregates — the q_*
    columns the generator emits as CAST(FLOOR(x*10000+0.5) AS BIGINT) —
    which may land on opposite sides of the floor boundary when Spark's
    parallel partial sums and DuckDB's sequential sum differ by an ulp:
    those integer columns get ±1. Everything else (raw MIN/MAX, COUNT,
    exact integer running sums, keys) must match exactly.

    Rows are re-sorted by the NON-q_ columns only before comparing: canon()
    sorts by all columns, so two rows whose q_ values straddle the floor
    boundary differently in the two engines would land in different sort
    positions and misalign the row-by-row compare even though every row is
    within tolerance. The generated shapes always have unique group keys
    per row, so the non-q_ columns are a total order."""
    if list(got.columns) != list(want.columns) or len(got) != len(want):
        return False
    keys = [c for c in got.columns if not c.startswith("q_")]
    if keys:
        got = got.sort_values(keys, kind="mergesort").reset_index(drop=True)
        want = want.sort_values(keys, kind="mergesort").reset_index(drop=True)
    for c in got.columns:
        g, w = got[c], want[c]
        if c.startswith("q_") and pd.api.types.is_integer_dtype(g) \
                and pd.api.types.is_integer_dtype(w):
            sentinel = -2**60
            if not ((g.fillna(sentinel).astype("int64")
                     - w.fillna(sentinel).astype("int64")).abs() <= 1).all():
                return False
        else:
            if not (g.map(repr) == w.map(repr)).all():
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qfile = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/fuzz_queries.json"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/target/fuzz_out"
    queries = json.load(open(qfile))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    npass = nfail = 0
    for name in sorted(queries):
        sql = queries[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(sql).df())
            ok = (list(got.columns) == list(want.columns) and len(got) == len(want)
                  and table_hash(got) == table_hash(want)) \
                or tolerant_equal(got, want)
        except Exception as e:
            print(f"✗ {name} ERROR {str(e)[:200]}\n  {sql}")
            nfail += 1
            continue
        if ok:
            npass += 1
        else:
            nfail += 1
            print(f"✗ {name} rows={len(got)}/{len(want)}\n  {sql}")
    print(f"\nfuzz: {npass}/{npass + nfail} queries match DuckDB")
    sys.exit(0 if nfail == 0 else 1)


if __name__ == "__main__":
    main()
