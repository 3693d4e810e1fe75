#!/usr/bin/env python3
"""Generate random reference-grammar SQL (dialect-neutral ANSI) for the
Engine.sql ↔ DuckDB differential test.

Grammar mirrors the reference surface: projection / SELECT * / DISTINCT /
WHERE with comparisons and AND-OR / SUM-AVG-MIN-MAX-COUNT / GROUP BY /
ORDER BY / two-table equality joins — plus the engine's extended surface:
LEFT JOIN, CASE banding, HAVING, window rank + running sum,
INTERSECT/EXCEPT, scalar subqueries. Deterministic (seeded).

Usage: python3 tools/gen_fuzz_sql.py [n] [out.json] [seed]
"""
import json
import random
import sys

TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "key": ["l_orderkey", "l_linenumber"],
    },
    "orders": {
        "num": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "int": ["o_orderkey", "o_custkey"],
        "key": ["o_orderkey"],
    },
    "customer": {
        "num": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
        "int": ["c_custkey", "c_nationkey"],
        "key": ["c_custkey"],
    },
    "part": {
        "num": ["p_retailprice"],
        "str": ["p_brand", "p_type"],
        "int": ["p_partkey", "p_size"],
        "key": ["p_partkey"],
    },
    "nation": {
        "num": [],
        "str": ["n_name"],
        "int": ["n_nationkey", "n_regionkey"],
        "key": ["n_nationkey"],
    },
}
STR_VALUES = {
    "l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY"],
    "p_brand": ["Brand#1", "Brand#2", "Brand#3"],
    "p_type": ["STANDARD", "SMALL", "MEDIUM"],
    "c_name": [], "n_name": [],
}
JOINS = [  # (left, right, on-left, on-right)
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
]


def pred(rng, t, cols):
    c = rng.choice(cols["num"] + cols["int"] + cols["str"])
    if c in cols["str"]:
        vals = STR_VALUES.get(c) or []
        if not vals:
            return f"{c} IS NOT NULL"
        op = rng.choice(["=", "<>", "<", ">="])
        return f"{c} {op} '{rng.choice(vals)}'"
    op = rng.choice(["<", "<=", ">", ">=", "="])
    if c in cols["int"]:
        return f"{c} {op} {rng.randint(0, 2000)}"
    return f"{c} {op} {round(rng.uniform(0, 100), 2)}"


def where(rng, t, cols):
    n = rng.randint(0, 2)
    if n == 0:
        return ""
    parts = [pred(rng, t, cols) for _ in range(n + 1)][: n + 1]
    conj = rng.choice([" AND ", " OR "])
    return " WHERE " + conj.join(f"({p})" for p in parts[:2]) if n >= 1 else ""


def agg_exprs(rng, cols):
    out = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["SUM", "AVG", "MIN", "MAX", "COUNT"])
        # SUM over integers diverges in result dtype (Spark BIGINT vs DuckDB
        # HUGEINT) even though values agree — keep SUM on double columns
        if kind == "SUM" and not cols["num"]:
            kind = "COUNT"
        # FLOOR(x*1e4 + 0.5), not ROUND/printf: decimal rounding of doubles
        # is engine-specific at repr boundaries (DuckDB round() and Java's
        # printf both round the SHORTEST DECIMAL REPR — in different
        # directions — while Spark round() and C printf use the exact binary
        # value). Pure double arithmetic is bitwise-identical in both
        # engines, so floor-based fixed-point agrees always.
        if kind == "COUNT":
            out.append(("COUNT(*)", f"cnt_{len(out)}"))
        elif kind in ("SUM", "AVG"):
            # q_ prefix = FLOOR-quantized double aggregate; ONLY these get the
            # checker's ±1 boundary tolerance (MIN/MAX/COUNT stay exact)
            c = rng.choice(cols["num"] if kind == "SUM" else cols["num"] + cols["int"])
            out.append((f"CAST(FLOOR({kind}({c}) * 10000 + 0.5) AS BIGINT)",
                        f"q_{len(out)}"))
        else:
            c = rng.choice(cols["num"] + cols["int"])
            out.append((f"{kind}({c})", f"a_{len(out)}"))
    return out


def gen_one(rng):
    shape = rng.choice(["scan", "distinct", "agg", "groupby", "join",
                        "groupby2", "having", "limit", "join3",
                        "leftjoin", "case", "window_rank", "window_runsum",
                        "setop", "scalar_sub",
                        "cube", "rollup", "ntile", "leadlag", "percent_rank",
                        "exists", "full_outer", "union_all", "in_sub",
                        "arith", "between_in", "offset", "like"])
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    if shape == "arith":
        # TPC-H expression idiom (price * (1 - discount) shape); MIN/MAX
        # over per-row products are summation-order-insensitive, unlike SUM
        nums = cols["num"]
        if len(nums) >= 2:
            a, b = rng.sample(nums, 2)
            expr = f"{a} * (1 + {b})"
        elif nums:
            expr = f"{nums[0]} * 2 + 1"
        else:
            expr = f"{cols['int'][0]} * 3 + 1"
        g = rng.choice(cols["str"] + [cols["int"][-1]])
        return (f"SELECT {g}, MIN({expr}) AS lo, MAX({expr}) AS hi, "
                f"COUNT(*) AS n FROM {t}{where(rng, t, cols)} "
                f"GROUP BY {g} ORDER BY {g}")
    if shape == "between_in":
        c = rng.choice(cols["num"] + cols["int"])
        lo, hi = sorted(rng.sample(range(0, 3000), 2))
        strpred = ""
        strs = [s for s in cols["str"] if STR_VALUES.get(s)]
        if strs:
            scol = rng.choice(strs)
            pick = rng.sample(STR_VALUES[scol],
                              min(2, len(STR_VALUES[scol])))
            inlist = ", ".join(f"'{v}'" for v in pick)
            strpred = f" AND {scol} IN ({inlist})"
        sel = sorted(set(cols["key"] + [c]))
        return (f"SELECT {', '.join(sel)} FROM {t} "
                f"WHERE {c} BETWEEN {lo} AND {hi}{strpred} "
                f"ORDER BY {', '.join(sel)}")
    if shape == "offset":
        o = rng.choice(cols["num"] + cols["int"])
        sel = sorted(set([o] + cols["key"]))
        lim, off = rng.randint(5, 100), rng.randint(1, 50)
        # unique-key tie-break keeps the OFFSET window deterministic
        return (f"SELECT {', '.join(sel)} FROM {t}{where(rng, t, cols)} "
                f"ORDER BY {o} {rng.choice(['ASC', 'DESC'])}, "
                f"{', '.join(cols['key'])} LIMIT {lim} OFFSET {off}")
    if shape == "like":
        strs = [s for s in cols["str"] if STR_VALUES.get(s)]
        if strs:
            scol = rng.choice(strs)
            v = rng.choice(STR_VALUES[scol])
            pat = v[:max(1, len(v) // 2)] + "%"
            sel = sorted(set(cols["key"] + [scol]))
            return (f"SELECT {', '.join(sel)} FROM {t} "
                    f"WHERE {scol} LIKE '{pat}' ORDER BY {', '.join(sel)}")
        return gen_one(rng)  # table with no enumerated strings: redraw
    CORR = [  # (parent, child, parent-key, child-fk)
        ("customer", "orders", "c_custkey", "o_custkey"),
        ("orders", "lineitem", "o_orderkey", "l_orderkey"),
        ("part", "lineitem", "p_partkey", "l_partkey"),
        ("nation", "customer", "n_nationkey", "c_nationkey"),
    ]
    if shape == "exists":
        pt, ct, pk, fk = rng.choice(CORR)
        neg = rng.choice(["EXISTS", "NOT EXISTS"])
        cpred = pred(rng, ct, TABLES[ct])
        sel = sorted(set(TABLES[pt]["key"]))
        return (f"SELECT {', '.join(sel)} FROM {pt} p WHERE {neg} "
                f"(SELECT 1 FROM {ct} c WHERE c.{fk} = p.{pk} AND ({cpred})) "
                f"ORDER BY {', '.join(sel)}")
    if shape == "full_outer":
        # two filtered key slices of one table, full-outer merged: exercises
        # null-extension on BOTH sides; key is unique so the result is total
        k = cols["key"][0]
        p1, p2 = pred(rng, t, cols), pred(rng, t, cols)
        return (f"SELECT a.{k} AS ka, b.{k} AS kb "
                f"FROM (SELECT {k} FROM {t} WHERE {p1}) a "
                f"FULL OUTER JOIN (SELECT {k} FROM {t} WHERE {p2}) b "
                f"ON a.{k} = b.{k} ORDER BY ka NULLS FIRST, kb NULLS FIRST")
    if shape == "union_all":
        c = rng.choice(cols["int"] +
                       [s for s in cols["str"] if STR_VALUES.get(s)])
        p1, p2 = pred(rng, t, cols), pred(rng, t, cols)
        return (f"SELECT x, COUNT(*) AS n FROM ("
                f"SELECT {c} AS x FROM {t} WHERE {p1} "
                f"UNION ALL SELECT {c} FROM {t} WHERE {p2}) u "
                f"GROUP BY x ORDER BY x")
    if shape == "in_sub":
        pt, ct, pk, fk = rng.choice(CORR)
        # IN only: NOT IN over a nullable subquery is a three-valued-logic
        # trap by design; the fk/pk columns here are non-null, but keep the
        # fuzz on the unambiguous form
        cpred = pred(rng, ct, TABLES[ct])
        sel = sorted(set(TABLES[pt]["key"]))
        return (f"SELECT {', '.join(sel)} FROM {pt} WHERE {pk} IN "
                f"(SELECT {fk} FROM {ct} WHERE {cpred}) "
                f"ORDER BY {', '.join(sel)}")
    if shape in ("cube", "rollup"):
        # grouping sets: explicit NULLS FIRST everywhere (Spark defaults
        # NULLS FIRST on ASC, DuckDB defaults NULLS LAST)
        pool = cols["str"] + cols["int"]
        gs = sorted(set(rng.sample(pool, min(2, len(pool)))))
        kw = "CUBE" if shape == "cube" else "ROLLUP"
        order = ", ".join(f"{g} NULLS FIRST" for g in gs)
        # HAVING n > 0: on an EMPTY input DuckDB emits the standard's
        # grand-total row (n=0) while Spark's Expand emits nothing; the
        # HAVING is an identity on non-empty inputs (every grouping-set row
        # counts >= 1) and aligns the empty case
        return (f"SELECT {', '.join(gs)}, COUNT(*) AS n FROM {t}"
                f"{where(rng, t, cols)} GROUP BY {kw} ({', '.join(gs)}) "
                f"HAVING COUNT(*) > 0 ORDER BY {order}")
    if shape == "ntile":
        c = rng.choice(cols["num"] + cols["int"])
        k = rng.randint(2, 12)
        keys = cols["key"]
        sel = sorted(set([c] + keys))
        # the window ORDER BY ends with the unique key → total order →
        # deterministic tile assignment on both engines
        return (f"SELECT {', '.join(sel)}, NTILE({k}) OVER "
                f"(ORDER BY {c}, {', '.join(keys)}) AS tile FROM {t}"
                f"{where(rng, t, cols)} ORDER BY {', '.join(keys)}")
    if shape == "leadlag":
        c = rng.choice(cols["num"] + cols["int"])
        keys = cols["key"]
        fn = rng.choice(["LAG", "LEAD"])
        sel = sorted(set([c] + keys))
        # LAG/LEAD copy raw column values (no arithmetic) → exact compare
        return (f"SELECT {', '.join(sel)}, {fn}({c}) OVER "
                f"(ORDER BY {', '.join(keys)}) AS adj FROM {t}"
                f"{where(rng, t, cols)} ORDER BY {', '.join(keys)}")
    if shape == "percent_rank":
        c = rng.choice(cols["num"] + cols["int"])
        keys = cols["key"]
        sel = sorted(set([c] + keys))
        return (f"SELECT {', '.join(sel)}, CAST(FLOOR(PERCENT_RANK() OVER "
                f"(ORDER BY {c}, {', '.join(keys)}) * 10000 + 0.5) AS BIGINT) "
                f"AS q_pr FROM {t}{where(rng, t, cols)} "
                f"ORDER BY {', '.join(keys)}")
    if shape == "window_rank":
        g = rng.choice(cols["str"] + [cols["int"][-1]])
        o = rng.choice(cols["num"] + cols["int"])
        keys = cols["key"]
        k = rng.randint(1, 5)
        # the window ORDER BY ends with the unique key → total order → the
        # rank is deterministic in both engines
        inner = f"{o} {rng.choice(['ASC', 'DESC'])}, {', '.join(keys)}"
        sel = sorted(set([g, o] + keys))
        return (f"SELECT {', '.join(sel)}, rn FROM (SELECT {', '.join(sel)}, "
                f"ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {inner}) AS rn "
                f"FROM {t}{where(rng, t, cols)}) sub "
                f"WHERE rn <= {k} ORDER BY {g}, rn")
    if shape == "window_runsum":
        c = rng.choice(cols["int"])
        keys = cols["key"]
        sel = sorted(set([c] + keys))
        # integer running sum is exact in both engines; CAST: DuckDB SUM(int)
        # is HUGEINT, Spark's is BIGINT
        return (f"SELECT {', '.join(sel)}, "
                f"CAST(SUM({c}) OVER (ORDER BY {', '.join(keys)} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs_0 "
                f"FROM {t}{where(rng, t, cols)} ORDER BY {', '.join(keys)}")
    if shape == "setop":
        op = rng.choice(["INTERSECT", "EXCEPT"])
        c = rng.choice(cols["int"] +
                       [s for s in cols["str"] if STR_VALUES.get(s)])
        p1, p2 = pred(rng, t, cols), pred(rng, t, cols)
        return (f"SELECT {c} FROM {t} WHERE {p1} {op} "
                f"SELECT {c} FROM {t} WHERE {p2} ORDER BY {c}")
    if shape == "scalar_sub":
        c = rng.choice(cols["int"])
        sel = sorted(set(cols["key"] + [c]))
        # AVG over ints: exact integer numerator → identical double in both
        # engines (a double-column AVG would diverge by summation order)
        return (f"SELECT {', '.join(sel)} FROM {t} "
                f"WHERE {c} > (SELECT AVG({c}) FROM {t}) "
                f"ORDER BY {', '.join(sel)}")
    if shape == "leftjoin":
        lt, rt, lk, rk = rng.choice(JOINS)
        rcols = TABLES[rt]
        rv = rng.choice(rcols["num"] + rcols["int"] + rcols["str"])
        sel = sorted(set(TABLES[lt]["key"]))
        w = where(rng, rt, rcols).replace(" WHERE ", "")
        sub = f"(SELECT {rk}, {rv} FROM {rt}{' WHERE (' + w + ')' if w else ''}) r"
        return (f"SELECT {', '.join(sel)}, r.{rv} FROM {lt} "
                f"LEFT JOIN {sub} ON {lk} = r.{rk} "
                f"ORDER BY {', '.join(sel)}, r.{rv} NULLS FIRST")
    if shape == "case":
        c = rng.choice(cols["num"] + cols["int"])
        cut1, cut2 = sorted(rng.sample(range(0, 2000), 2))
        return (f"SELECT CASE WHEN {c} < {cut1} THEN 'a' WHEN {c} < {cut2} THEN 'b' "
                f"ELSE 'c' END AS band, COUNT(*) AS n FROM {t}{where(rng, t, cols)} "
                f"GROUP BY 1 ORDER BY band")
    if shape == "groupby2":
        pool = cols["str"] + cols["int"]
        gs = sorted(set(rng.sample(pool, min(2, len(pool)))))
        aggs = agg_exprs(rng, cols)
        sel = ", ".join(gs + [f"{e} AS {a}" for e, a in aggs])
        return (f"SELECT {sel} FROM {t}{where(rng, t, cols)} "
                f"GROUP BY {', '.join(gs)} ORDER BY {', '.join(gs)}")
    if shape == "having":
        g = rng.choice(cols["str"] + cols["int"])
        n = rng.randint(2, 40)
        return (f"SELECT {g}, COUNT(*) AS n FROM {t}{where(rng, t, cols)} "
                f"GROUP BY {g} HAVING COUNT(*) >= {n} ORDER BY {g}")
    if shape == "limit":
        pool = cols["num"] + cols["int"]
        o = rng.choice(pool)
        direction = rng.choice(["ASC", "DESC"])
        sel = sorted(set([o] + cols["key"]))
        lim = rng.randint(5, 200)
        # unique-key tie-break keeps LIMIT deterministic
        return (f"SELECT {', '.join(sel)} FROM {t}{where(rng, t, cols)} "
                f"ORDER BY {o} {direction}, {', '.join(cols['key'])} LIMIT {lim}")
    if shape == "join3":
        sel = ["l_orderkey", "l_linenumber", "o_custkey", "c_name", "l_quantity"]
        w = where(rng, "lineitem", TABLES["lineitem"]).replace(" WHERE ", "")
        extra = f" AND ({w})" if w else ""
        return ("SELECT " + ", ".join(sel) +
                " FROM lineitem, orders, customer"
                " WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey" + extra +
                " ORDER BY l_orderkey, l_linenumber")
    if shape == "scan":
        ncols = rng.randint(1, 3)
        pool = cols["num"] + cols["str"] + cols["int"]
        sel = sorted(set(rng.sample(pool, min(ncols, len(pool))) + cols["key"]))
        order = ", ".join(cols["key"])
        return f"SELECT {', '.join(sel)} FROM {t}{where(rng, t, cols)} ORDER BY {order}"
    if shape == "distinct":
        pool = cols["str"] + cols["int"]
        sel = sorted(set(rng.sample(pool, min(2, len(pool)))))
        return (f"SELECT DISTINCT {', '.join(sel)} FROM {t}{where(rng, t, cols)} "
                f"ORDER BY {', '.join(sel)}")
    if shape == "agg":
        aggs = agg_exprs(rng, cols)
        sel = ", ".join(f"{e} AS {a}" for e, a in aggs)
        return f"SELECT {sel} FROM {t}{where(rng, t, cols)}"
    if shape == "groupby":
        g = rng.choice(cols["str"] + cols["int"])
        aggs = agg_exprs(rng, cols)
        sel = ", ".join([g] + [f"{e} AS {a}" for e, a in aggs])
        return (f"SELECT {sel} FROM {t}{where(rng, t, cols)} GROUP BY {g} "
                f"ORDER BY {g}")
    lt, rt, lk, rk = rng.choice(JOINS)
    lcols, rcols = TABLES[lt], TABLES[rt]
    sel = sorted(set(
        rng.sample(lcols["num"] + lcols["str"] + lcols["int"], 2) +
        rng.sample(rcols["num"] + rcols["str"] + rcols["int"], 1) +
        lcols["key"]))
    # parenthesize the extra predicates: a bare "... AND p1 OR p2" would let
    # the OR branch escape the join condition (quasi-cross-join)
    wbody = where(rng, lt, lcols).replace(" WHERE ", "")
    w = f" AND ({wbody})" if wbody else ""
    return (f"SELECT {', '.join(sel)} FROM {lt}, {rt} "
            f"WHERE {lk} = {rk}{w} ORDER BY {', '.join(lcols['key'])}, {', '.join(sel)}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/fuzz_queries.json"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20260812
    rng = random.Random(seed)
    queries = {f"fuzz_{i:03d}": gen_one(rng) for i in range(n)}
    with open(out, "w") as f:
        json.dump(queries, f, indent=1)
    print(f"wrote {n} queries to {out}")


if __name__ == "__main__":
    main()
