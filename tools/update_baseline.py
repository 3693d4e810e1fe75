#!/usr/bin/env python3
"""Incrementally refresh BASELINE rows: re-measure ONLY the named queries
(plus any present in oracle_sql.json but missing from the baseline, and
drop baseline rows whose query no longer exists), merging into
BASELINE_duckdb.json and regenerating BASELINE.md's table from the merged
timings. Measurement protocol is identical to bench_baseline.py: one
untimed warmup, MEDIAN of three timed CREATE TEMP TABLE materializations.

Usage: python3 tools/update_baseline.py [sf_dir] [q1,q2,...]
       (no query list -> just add missing / drop stale)
"""
import json
import re
import sys
import time

import duckdb

BASE = "/root/repo/BASELINE_duckdb.json"
BASE_MD = "/root/repo/BASELINE.md"
ORACLE = "/root/repo/target/verify_out/oracle_sql.json"


def measure(con, name, sql, i):
    samples = []
    for run in range(4):
        con.execute(f"DROP TABLE IF EXISTS _b{i}")
        t0 = time.time()
        try:
            con.execute(f"CREATE TEMP TABLE _b{i} AS {sql}")
        except Exception as e:
            print(f"✗ {name}: {str(e)[:120]}")
            return None
        if run > 0:
            samples.append(time.time() - t0)
    con.execute(f"DROP TABLE IF EXISTS _b{i}")
    med = sorted(samples)[len(samples) // 2]
    print(f"{name}: {med:.3f}s (runs: " +
          ", ".join(f"{s:.3f}" for s in samples) + ")")
    return med


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    explicit = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
    oracle = json.load(open(ORACLE))
    base = json.load(open(BASE))
    # mixed-scale rows would silently corrupt every engine-ratio read
    if base.get("sf") and base["sf"].rstrip("/") != sf_dir.rstrip("/"):
        sys.exit(f"refusing to merge {sf_dir} timings into a baseline "
                 f"measured at {base['sf']} — regenerate fully instead")
    timings = base["queries"]
    stale = sorted(set(timings) - set(oracle))
    missing = sorted(set(oracle) - set(timings))
    for q in stale:
        del timings[q]
        print(f"dropped stale baseline row: {q}")
    todo = sorted((explicit | set(missing)) & set(oracle))
    if todo:
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        for i, name in enumerate(todo):
            m = measure(con, name, oracle[name], i)
            if m is not None:
                timings[name] = round(m, 3)
    base["total_sec"] = round(sum(timings.values()), 3)
    json.dump(base, open(BASE, "w"), indent=1, sort_keys=True)
    # regenerate the BASELINE.md table in place, preserving the header
    md = open(BASE_MD).read()
    head = md[:md.index("| query | duckdb_sec |")]
    daggered = {"q_media_decode", "q_media_audio", "q_media_video"}
    rows = [f"| {q}{' †' if q in daggered else ''} | {timings[q]:.3f} |"
            for q in sorted(timings)]
    table = ("| query | duckdb_sec |\n|---|---|\n" + "\n".join(rows) +
             f"\n| **total ({len(timings)} queries)** | "
             f"**{base['total_sec']:.3f}** |\n\n"
             "Regenerate: `python3 tools/bench_baseline.py "
             f"{sf_dir}`; incremental rows: "
             "`python3 tools/update_baseline.py`\n")
    open(BASE_MD, "w").write(head + table)
    print(f"updated {len(todo)} rows; total {base['total_sec']:.1f}s "
          f"over {len(timings)} queries")


if __name__ == "__main__":
    main()
