#!/usr/bin/env python3
"""DuckDB arm of the SuffixDedup crossover measurement (r14).

Runs the EXACT q_dup_substrings oracle SQL (the direct substring-group
derivation) against the scaled corpora graft.SuffixCrossover wrote, and
times it the same way the baseline protocol does (materialize
everything, min of 2 after a warmup).

Usage: python3 tools/suffix_crossover_duckdb.py target/suffix_scale/x1 [x3 ...]
"""
import json
import sys
import time

import duckdb

ORACLE = json.load(open("target/verify_out/oracle_sql.json"))["q_dup_substrings"]


def run(scale_dir: str) -> None:
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{scale_dir}/*.parquet')"
    )
    times = []
    for i in range(3):  # run 0 = warmup
        t0 = time.time()
        con.execute(ORACLE).fetchall()
        dt = time.time() - t0
        if i > 0:
            times.append(dt)
    print(f"{scale_dir}: duckdbSec={min(times):.2f} (runs {','.join(f'{t:.2f}' for t in times)})")
    con.close()


if __name__ == "__main__":
    for d in sys.argv[1:]:
        run(d)
