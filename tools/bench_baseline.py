#!/usr/bin/env python3
"""Measure the DuckDB baseline: wall-time of every oracle SQL query at a
given scale factor, fully materialized (CREATE TEMP TABLE AS ... including
each query's ORDER BY), so the work matches what graft.Bench forces with its
noop sink. Writes BASELINE.md + baseline JSON.

Usage: python3 tools/bench_baseline.py [sf_dir] [oracle_sql.json] [out_md]
"""
import json
import sys
import time

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qfile = (sys.argv[2] if len(sys.argv) > 2
             else "/root/repo/target/verify_out/oracle_sql.json")
    out_md = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/BASELINE.md"
    oracle = json.load(open(qfile))
    con = duckdb.connect()
    nthreads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    timings = {}
    for i, name in enumerate(sorted(oracle)):
        # warmup run (buffer cache, plan), then MEDIAN of three timed
        # materialized runs: single-shot DuckDB times on the heavy queries
        # swing ±50% run to run in this environment, which would make the
        # baseline comparison a coin flip
        samples = []
        failed = False
        for run in range(4):
            con.execute(f"DROP TABLE IF EXISTS _b{i}")
            t0 = time.time()
            try:
                con.execute(f"CREATE TEMP TABLE _b{i} AS {oracle[name]}")
                dt = time.time() - t0
            except Exception as e:
                # any failure disqualifies the query entirely — a partial
                # sample set must not masquerade as a healthy median
                timings[name] = None
                failed = True
                print(f"✗ {name}: {str(e)[:120]}")
                break
            if run > 0:
                samples.append(dt)
        if not failed and samples:
            timings[name] = sorted(samples)[len(samples) // 2]
            print(f"{name}: {timings[name]:.3f}s (runs: "
                  + ", ".join(f"{s:.3f}" for s in samples) + ")")
        con.execute(f"DROP TABLE IF EXISTS _b{i}")
    ok = {k: v for k, v in timings.items() if v is not None}
    total = sum(ok.values())
    with open(out_md, "w") as f:
        f.write("# BASELINE — measured DuckDB timings\n\n")
        f.write(f"DuckDB {duckdb.__version__}, {nthreads} threads, "
                f"dataset `{sf_dir}`.\n\n")
        f.write("Each row is the MEDIAN wall-time of three runs of one "
                "oracle SQL query (the same SQL the driver's correctness "
                "gate runs), fully MATERIALIZED into a temp table including "
                "its ORDER BY — matching what `graft.Bench` forces through "
                "its noop sink. One untimed warmup run precedes the timed "
                "runs, mirroring Bench's protocol. The hash-kernel queries "
                "(minhash/LSH/simhash/SRP/xxhash families) run as portable-"
                "SQL re-derivations of the engine's custom kernels "
                "(MinhashOracleSql/KernelOracleSql/SrpOracleSql) — DuckDB "
                "has no native equivalents, so their baseline rows measure "
                "SQL-expressed semantics, not a tuned native implementation; "
                "read per-query ratios on those rows with that in mind. "
                "Rows-only queries (IVF/approx-percentiles/stratified-"
                "sample/freq-sketch — approximate or RNG-based by design) "
                "have no baseline row.\n\n")
        f.write("**Measurement-class mismatch (r10 verdict item 7):** "
                "`q_media_decode`, `q_media_audio`, and `q_media_video` are "
                "apples-to-oranges rows by construction — the engine "
                "performs a REAL codec round trip per document (PNG/WAV/AVI "
                "encode via the JDK, then decode and feature-extract the "
                "produced bytes), while the DuckDB \"baseline\" can only "
                "replay the deterministic generation formula those bytes "
                "came from (DuckDB has no codecs). Their ratios measure "
                "codec work the baseline never does; read them as "
                "correctness anchors (the hash match proves the decode) "
                "rather than throughput comparisons. Their table rows are "
                "marked with †.\n\n")
        mismatched = {"q_media_decode", "q_media_audio", "q_media_video"}
        f.write("| query | duckdb_sec |\n|---|---|\n")
        for name in sorted(ok):
            dag = " †" if name in mismatched else ""
            f.write(f"| {name}{dag} | {ok[name]:.3f} |\n")
        f.write(f"| **total ({len(ok)} queries)** | **{total:.3f}** |\n")
        f.write(f"\nRegenerate: `python3 tools/bench_baseline.py {sf_dir}`\n")
    json.dump({"sf": sf_dir, "duckdb": duckdb.__version__,
               "threads": nthreads, "total_sec": total, "queries": timings},
              open(out_md.replace(".md", "_duckdb.json"), "w"), indent=1)
    print(f"\ntotal {total:.2f}s over {len(ok)} queries → {out_md}")


if __name__ == "__main__":
    main()
