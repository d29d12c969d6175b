#!/usr/bin/env python
"""Seeded differential query fuzzer: random plans, Spark vs DuckDB.

The registry's 156 oracle queries pin HAND-PICKED plans. This tool
pins the ENGINE SURFACE: it generates random-but-deterministic
query specs from a small grammar (scan -> filters -> optional FK
join (inner | left | semi | anti, the latter two rendered as
(NOT) EXISTS on the SQL side to also pin subquery decorrelation) ->
project | distinct | group-aggregate [-> having]
[-> order+limit]), renders each spec TWICE — once through our
DataFrame-building code path, once as ANSI SQL for DuckDB — and
compares row count, schema, and the driver's order-insensitive
value hash (same comparator as tools/check_correctness.py).

Hash-stability rules baked into the grammar (each is a real
cross-engine boundary, learned from rounds 1-11):

- double SUM/AVG are order-nondeterministic -> money sums go through
  DECIMAL(18,2) and are rendered as fixed-scale strings (the
  revenue_exact_decimal pattern); AVG is excluded entirely.
- Spark orders NULLS FIRST ascending, DuckDB NULLS LAST -> every
  ORDER BY is rendered with explicit NULLS FIRST on both sides.
- a LIMIT under a non-total ORDER BY is engine-nondeterministic ->
  ORDER BY always covers ALL output columns. (The first 300-case run
  caught exactly this: this synthetic lineitem does NOT have the
  TPC-H (l_orderkey, l_linenumber) primary key — 60k rows, 45.8k
  distinct pairs — so "order by pk" picked different boundary rows
  per engine. The fuzzer's first finding was its own wrong
  uniqueness assumption; the full-row order keeps any remaining
  boundary ties indistinguishable, hence hash-stable.)
- computed per-row double arithmetic (x * (1 - d)) IS bit-stable
  across engines (same IEEE ops on the same stored values) and is
  included deliberately to pin that.
- integer SUM overflows BIGINT differently per engine -> sums are
  restricted to columns whose max * rowcount fits comfortably.

Usage: python tools/fuzz_differential.py [sf_dir] [--n N]
           [--seed S | --seeds A,B,...] [--out FILE] [--window-cap ROWS]
Writes FUZZ.json at the repo root; exit 1 on any mismatch.
--window-cap ROWS (the ×100 tier knob): window-family cases over tables
larger than ROWS get a mandatory pushed-down modulo filter sized to cap
the window input near ROWS (see the window grammar comment).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.engine import get_spark
from ska_src_maltopuft_etl_spark.sources import load_tables
from tools.check_correctness import frame_hash

# ---------------------------------------------------------------- grammar ---

# Per-table column roles. `ints` are filter/arith/sum candidates,
# `money` goes through the decimal path, `strs` are equality/IN/LIKE
# and grouping candidates, `ts` are range-filter + min/max candidates.
# NOTE: no primary-key assumption anywhere — this synthetic data has
# duplicate (l_orderkey, l_linenumber) pairs (see module docstring).
TABLES = {
    "lineitem": dict(
        ints=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        money=["l_extendedprice"],
        strs=["l_returnflag", "l_linestatus"],
        ts=["l_shipdate"],
        sum_ok=["l_linenumber", "l_suppkey"],
    ),
    "orders": dict(
        ints=["o_orderkey", "o_custkey"],
        money=["o_totalprice"],
        strs=["o_orderstatus", "o_orderpriority"],
        ts=["o_orderdate"],
        sum_ok=["o_custkey"],
    ),
    "customer": dict(
        ints=["c_custkey", "c_nationkey"],
        money=["c_acctbal"],
        strs=["c_mktsegment"],
        ts=[],
        sum_ok=["c_nationkey"],
    ),
    "part": dict(
        ints=["p_partkey", "p_size"],
        money=["p_retailprice"],
        strs=["p_brand", "p_type"],
        ts=[],
        sum_ok=["p_size"],
    ),
    "events": dict(
        ints=["event_id", "user_id"],
        money=["value"],
        strs=["event_type"],
        ts=["ts"],
        sum_ok=["user_id"],
    ),
    "documents": dict(
        ints=["doc_id", "n_chars"],
        money=[],
        strs=["lang", "source"],
        ts=[],
        sum_ok=["n_chars"],
    ),
}

# FK equi-joins (left table drives the scan; all inner).
JOINS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
]

NUM_OPS = ["<", "<=", ">", ">=", "=", "<>"]


def table_stats(con: duckdb.DuckDBPyConnection, sf_dir: str) -> dict:
    """Deterministic literal pools per column (min/max, distinct strings)."""
    stats: dict = {}
    for t, meta in TABLES.items():
        src = f"read_parquet('{sf_dir}/{t}.parquet')"
        s: dict = {"str_vals": {}, "num_range": {}, "ts_range": {}}
        s["rowcount"] = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        for c in meta["strs"]:
            vals = con.execute(
                f"SELECT DISTINCT {c} FROM {src} WHERE {c} IS NOT NULL "
                f"ORDER BY {c} LIMIT 8"
            ).fetchall()
            s["str_vals"][c] = [v[0] for v in vals]
        for c in meta["ints"] + meta["money"]:
            lo, hi = con.execute(f"SELECT min({c}), max({c}) FROM {src}").fetchone()
            s["num_range"][c] = (lo, hi)
        for c in meta["ts"]:
            lo, hi = con.execute(
                f"SELECT epoch(min({c}))::BIGINT, epoch(max({c}))::BIGINT FROM {src}"
            ).fetchone()
            s["ts_range"][c] = (lo, hi)
        stats[t] = s
    return stats


def gen_pred(rng: random.Random, t: str, stats: dict) -> dict | None:
    meta, s = TABLES[t], stats[t]
    kinds = []
    if meta["ints"] or meta["money"]:
        kinds += ["num"] * 3
    if meta["strs"]:
        kinds += ["str_eq", "str_in", "like"]
    if meta["ts"]:
        kinds += ["ts"] * 2
    kind = rng.choice(kinds)
    if kind == "num":
        c = rng.choice(meta["ints"] + meta["money"])
        lo, hi = s["num_range"][c]
        if lo is None:
            return None
        if isinstance(lo, int):
            lit = rng.randint(int(lo), int(hi)) if hi > lo else int(lo)
        else:
            lit = round(rng.uniform(float(lo), float(hi)), 2)
        return {"k": "num", "col": c, "op": rng.choice(NUM_OPS), "lit": lit}
    if kind == "str_eq":
        c = rng.choice(meta["strs"])
        if not s["str_vals"][c]:
            return None
        return {"k": "str_eq", "col": c, "lit": rng.choice(s["str_vals"][c])}
    if kind == "str_in":
        c = rng.choice(meta["strs"])
        pool = s["str_vals"][c]
        if len(pool) < 2:
            return None
        vals = rng.sample(pool, rng.randint(2, min(4, len(pool))))
        return {"k": "str_in", "col": c, "vals": sorted(vals)}
    if kind == "like":
        c = rng.choice(meta["strs"])
        if not s["str_vals"][c]:
            return None
        v = rng.choice(s["str_vals"][c])
        return {"k": "like", "col": c, "prefix": v[: max(1, len(v) // 2)]}
    # ts range
    c = rng.choice(meta["ts"])
    lo, hi = s["ts_range"][c]
    if lo is None:
        return None
    at = rng.randint(lo, hi)
    lit = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(at))
    return {"k": "ts", "col": c, "op": rng.choice(["<", ">=", ">"]), "lit": lit}


def gen_spec(rng: random.Random, stats: dict, window_cap: int = 0) -> dict:
    join = rng.choice(JOINS) if rng.random() < 0.4 else None
    how = "inner"
    if join:
        # semi/anti keep only left columns; left null-extends the right
        how = rng.choice(["inner", "inner", "left", "semi", "anti"])
    t = join[0] if join else rng.choice(sorted(TABLES))
    tables = [t] + ([join[1]] if join and how in ("inner", "left") else [])
    preds = []
    for _ in range(rng.randint(0, 3)):
        pt = rng.choice(tables)
        p = gen_pred(rng, pt, stats)
        if p is not None:
            if rng.random() < 0.15:
                p = {"k": "not", "p": p}
            preds.append(p)
    # OR-combine two preds from the same table occasionally
    if len(preds) >= 2 and rng.random() < 0.3:
        a, b = preds[0], preds[1]
        preds = [{"k": "or", "a": a, "b": b}] + preds[2:]

    kind = rng.choice(
        ["project", "project", "distinct", "agg", "agg", "agg", "window", "window"]
    )
    spec = {"table": t, "join": join, "join_how": how, "preds": preds, "kind": kind}

    def maybe_cap():
        # window_cap (round-13, the ×100 fuzz tier): result- or
        # partition-unbounded shapes cannot run raw over a 60M-row
        # table — WindowExec moves the whole input through a handful of
        # low-cardinality string partitions (minutes per case, the
        # round-12 open thread), and an unlimited project/distinct
        # collect()s up to the full table (its first ×100 run tripped
        # spark.driver.maxResultSize at 60M joined rows). A mandatory
        # pushed-down modulo filter on a well-spread key caps the input
        # near `window_cap` rows; the predicate renders identically in
        # both engines (non-negative integer keys, same % semantics),
        # so equivalence is untouched — only the tested subset shrinks.
        rc = stats[t]["rowcount"]
        if window_cap and rc > window_cap:
            m = max(2, rc // window_cap)
            # High-cardinality guard (round-14 advice): the cap is only
            # a cap if col % m == r is ~1/m selective. A low-cardinality
            # column (l_linenumber: 1..7) concentrates into few residues
            # — keeping nearly all rows (re-exposing the OOM the cap
            # prevents) or zero — and a zipf-hot key (user_id in the
            # skew tiers) has a large SPAN but concentrated mass, so a
            # span check is not enough. Restrict to the FIRST int
            # column, PK-like by TABLES convention
            # (orderkey/custkey/partkey/event_id/doc_id): dense and
            # near-uniform across residues even in the zipf tiers.
            c = TABLES[t]["ints"][0]
            spec["pre_mod"] = {"col": c, "m": m, "r": rng.randrange(m)}
    all_strs = [c for x in tables for c in TABLES[x]["strs"]]
    all_ints = [c for x in tables for c in TABLES[x]["ints"]]

    if kind == "distinct":
        pool = all_strs + [c for x in tables for c in TABLES[x]["ints"][1:]]
        spec["cols"] = sorted(rng.sample(pool, rng.randint(1, min(2, len(pool)))))
        maybe_cap()  # distinct over int columns approaches table cardinality
        return spec

    if kind == "window":
        # Window semantics pinned: row_number/rank need a TOTAL order
        # within the partition (ties = identical full rows, so any
        # tie-break yields the same multiset); cumulative sums use the
        # default frame — RANGE UNBOUNDED PRECEDING..CURRENT ROW, which
        # includes PEERS, so equal sort keys must aggregate together
        # identically in both engines; running FP sums are excluded
        # (order-dependent accumulation), integer sums only.
        #
        part = rng.choice(all_strs)
        base = {part}
        base.update(rng.sample(all_ints, min(len(all_ints), rng.randint(1, 2))))
        if rng.random() < 0.4:
            base.update(rng.sample(all_strs, 1))
        spec["cols"] = sorted(base)
        spec["part_col"] = part
        pool = ["row_number", "rank", "dense_rank", "lag", "psum", "csum"]
        picks = rng.sample(pool, rng.randint(1, 3))
        wexprs = []
        sums = [c for x in tables for c in TABLES[x]["sum_ok"]]
        for p in sorted(set(picks)):
            if p in ("row_number", "rank", "dense_rank"):
                wexprs.append({"k": p, "name": f"w_{p}"})
            elif p == "lag":
                c = rng.choice(sorted(base))
                wexprs.append({"k": "lag", "name": "w_lag", "col": c})
            elif p in ("psum", "csum") and sums:
                c = rng.choice(sums)
                wexprs.append({"k": p, "name": f"w_{p}", "col": c})
        if not wexprs:
            wexprs = [{"k": "row_number", "name": "w_row_number"}]
        spec["wexprs"] = wexprs
        maybe_cap()
        return spec

    if kind == "project":
        cols = set(rng.sample(TABLES[t]["ints"], min(2, len(TABLES[t]["ints"]))))
        cols.update(rng.sample(all_strs, min(len(all_strs), rng.randint(0, 2))))
        cols.update(rng.sample(all_ints, min(len(all_ints), rng.randint(0, 2))))
        spec["cols"] = sorted(cols)
        computed = []
        if len(all_ints) >= 2 and rng.random() < 0.5:
            c1, c2 = rng.sample(all_ints, 2)
            computed.append(
                {"k": "arith", "name": "x_arith", "c1": c1, "c2": c2,
                 "op": rng.choice(["+", "-", "*"])}
            )
        if t == "lineitem" and rng.random() < 0.5:
            computed.append({"k": "money_expr", "name": "x_money"})
        if all_strs and rng.random() < 0.3:
            computed.append(
                {"k": "strlen", "name": "x_len", "col": rng.choice(all_strs)}
            )
        spec["computed"] = computed
        if rng.random() < 0.5:
            spec["order_limit"] = rng.randint(5, 50)
        else:
            maybe_cap()  # an unlimited project collects up to the table
        return spec

    # aggregate
    gcols = sorted(set(rng.sample(all_strs, rng.randint(0, min(2, len(all_strs))))))
    if rng.random() < 0.25 and all_ints:
        spec["group_mod"] = {"col": rng.choice(all_ints), "m": rng.choice([7, 10, 13])}
    spec["group_cols"] = gcols
    aggs = [{"k": "cnt", "name": "n_rows"}]
    moneys = [c for x in tables for c in TABLES[x]["money"]]
    sums = [c for x in tables for c in TABLES[x]["sum_ok"]]
    tss = [c for x in tables for c in TABLES[x]["ts"]]
    if moneys and rng.random() < 0.7:
        c = rng.choice(moneys)
        aggs.append({"k": "summoney", "name": f"sum_{c}", "col": c})
    if sums and rng.random() < 0.5:
        c = rng.choice(sums)
        aggs.append({"k": "sumint", "name": f"sumi_{c}", "col": c})
    if all_ints and rng.random() < 0.6:
        c = rng.choice(all_ints)
        aggs.append({"k": rng.choice(["min", "max"]), "name": f"mm_{c}", "col": c})
    if tss and rng.random() < 0.4:
        c = rng.choice(tss)
        aggs.append(
            {"k": rng.choice(["mints", "maxts"]), "name": f"mmts_{c}", "col": c}
        )
    if all_ints and rng.random() < 0.4:
        c = rng.choice(all_ints)
        aggs.append({"k": "cntd", "name": f"nd_{c}", "col": c})
    # COUNT(col) null-skipping: meaningfully different from COUNT(*)
    # only when the column can be NULL — i.e. right-table columns under
    # a LEFT join — but pinning the identical-when-not-null case is
    # cheap and the left-join case is the real target.
    if all_ints and rng.random() < 0.3:
        c = rng.choice(all_ints)
        aggs.append({"k": "cntcol", "name": f"nc_{c}", "col": c})
    spec["aggs"] = aggs
    if gcols and rng.random() < 0.3:
        spec["having_min_rows"] = rng.randint(2, 50)
    return spec


# ------------------------------------------------------------- rendering ----


def pred_spark(p: dict):
    k = p["k"]
    if k == "not":
        return ~pred_spark(p["p"])
    if k == "or":
        return pred_spark(p["a"]) | pred_spark(p["b"])
    c = F.col(p["col"])
    if k == "num":
        op = p["op"]
        return {
            "<": c < p["lit"], "<=": c <= p["lit"], ">": c > p["lit"],
            ">=": c >= p["lit"], "=": c == p["lit"], "<>": c != p["lit"],
        }[op]
    if k == "str_eq":
        return c == p["lit"]
    if k == "str_in":
        return c.isin(p["vals"])
    if k == "like":
        return c.startswith(p["prefix"])
    if k == "ts":
        lit = F.to_timestamp(F.lit(p["lit"]))
        return {"<": c < lit, ">=": c >= lit, ">": c > lit}[p["op"]]
    raise ValueError(k)


def _sqlq(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def pred_sql(p: dict) -> str:
    k = p["k"]
    if k == "not":
        return f"NOT ({pred_sql(p['p'])})"
    if k == "or":
        return f"(({pred_sql(p['a'])}) OR ({pred_sql(p['b'])}))"
    c = p["col"]
    if k == "num":
        return f"{c} {p['op']} {p['lit']!r}".replace("'", "")
    if k == "str_eq":
        return f"{c} = {_sqlq(p['lit'])}"
    if k == "str_in":
        return f"{c} IN ({', '.join(_sqlq(v) for v in p['vals'])})"
    if k == "like":
        esc = p["prefix"].replace("%", "\\%").replace("_", "\\_")
        return f"{c} LIKE {_sqlq(esc + '%')} ESCAPE '\\'"
    if k == "ts":
        return f"{c} {p['op']} TIMESTAMP {_sqlq(p['lit'])}"
    raise ValueError(k)


MONEY_EXPR_SQL = (
    "l_extendedprice * (1 - l_discount)"  # per-row double: IEEE-identical
)


def computed_spark(c: dict):
    if c["k"] == "arith":
        a, b = F.col(c["c1"]), F.col(c["c2"])
        e = {"+": a + b, "-": a - b, "*": a * b}[c["op"]]
    elif c["k"] == "money_expr":
        e = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    elif c["k"] == "strlen":
        e = F.length(F.col(c["col"]))
    else:
        raise ValueError(c["k"])
    return e.alias(c["name"])


def computed_sql(c: dict) -> str:
    if c["k"] == "arith":
        return f"({c['c1']} {c['op']} {c['c2']}) AS {c['name']}"
    if c["k"] == "money_expr":
        return f"({MONEY_EXPR_SQL}) AS {c['name']}"
    if c["k"] == "strlen":
        return f"LENGTH({c['col']}) AS {c['name']}"
    raise ValueError(c["k"])


def agg_spark(a: dict):
    k, name = a["k"], a["name"]
    if k == "cnt":
        return F.count(F.lit(1)).alias(name)
    c = F.col(a["col"])
    if k == "cntcol":
        return F.count(c).alias(name)
    if k == "cntd":
        return F.countDistinct(c).alias(name)
    if k == "min":
        return F.min(c).alias(name)
    if k == "max":
        return F.max(c).alias(name)
    # timestamp min/max surface as epoch micros, never raw objects:
    # non-Arrow collect() localizes TimestampType via the OS timezone
    # (not spark.sql.session.timeZone), so a raw object in frame_hash
    # would falsely diverge from DuckDB's naive UTC on non-UTC hosts.
    if k == "mints":
        return F.unix_micros(F.min(c)).alias(name)
    if k == "maxts":
        return F.unix_micros(F.max(c)).alias(name)
    if k == "sumint":
        return F.sum(c).alias(name)
    if k == "summoney":
        return (
            F.sum(c.cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias(name)
        )
    raise ValueError(k)


def agg_sql(a: dict) -> str:
    k, name = a["k"], a["name"]
    if k == "cnt":
        return f"CAST(COUNT(*) AS BIGINT) AS {name}"
    c = a["col"]
    if k == "cntcol":
        return f"CAST(COUNT({c}) AS BIGINT) AS {name}"
    if k == "cntd":
        return f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {name}"
    if k in ("min", "max"):
        return f"{k.upper()}({c}) AS {name}"
    if k in ("mints", "maxts"):
        return f"CAST(epoch_us({k[:3].upper()}({c})) AS BIGINT) AS {name}"
    if k == "sumint":
        return f"CAST(SUM({c}) AS BIGINT) AS {name}"
    if k == "summoney":
        return (
            f"CAST(CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DECIMAL(38,2)) "
            f"AS VARCHAR) AS {name}"
        )
    raise ValueError(k)


def build_spark(spec: dict, tables: dict) -> DataFrame:
    df = tables[spec["table"]]
    if "pre_mod" in spec:
        pm = spec["pre_mod"]
        df = df.filter((F.col(pm["col"]) % pm["m"]) == pm["r"])
    if spec["join"]:
        _, rt, lk, rk = spec["join"]
        how = {"inner": "inner", "left": "left",
               "semi": "left_semi", "anti": "left_anti"}[spec.get("join_how", "inner")]
        df = df.join(tables[rt], F.col(lk) == F.col(rk), how)
    for p in spec["preds"]:
        df = df.filter(pred_spark(p))
    kind = spec["kind"]
    if kind == "distinct":
        return df.select(*spec["cols"]).distinct()
    if kind == "window":
        from pyspark.sql.window import Window

        order = [F.col(c).asc_nulls_first() for c in spec["cols"]]
        w_ord = Window.partitionBy(spec["part_col"]).orderBy(*order)
        w_all = Window.partitionBy(spec["part_col"])
        exprs = [F.col(c) for c in spec["cols"]]
        for w in spec["wexprs"]:
            k, name = w["k"], w["name"]
            if k == "row_number":
                exprs.append(F.row_number().over(w_ord).alias(name))
            elif k == "rank":
                exprs.append(F.rank().over(w_ord).alias(name))
            elif k == "dense_rank":
                exprs.append(F.dense_rank().over(w_ord).alias(name))
            elif k == "lag":
                exprs.append(F.lag(F.col(w["col"]), 1).over(w_ord).alias(name))
            elif k == "psum":
                exprs.append(F.sum(F.col(w["col"])).over(w_all).alias(name))
            elif k == "csum":
                exprs.append(F.sum(F.col(w["col"])).over(w_ord).alias(name))
        return df.select(*exprs)
    if kind == "project":
        exprs = [F.col(c) for c in spec["cols"]]
        exprs += [computed_spark(c) for c in spec.get("computed", [])]
        out = df.select(*exprs)
        if "order_limit" in spec:
            out = out.orderBy(
                *[F.col(c).asc_nulls_first() for c in out.columns]
            ).limit(spec["order_limit"])
        return out
    # aggregate
    gexprs = [F.col(c) for c in spec["group_cols"]]
    if "group_mod" in spec:
        gm = spec["group_mod"]
        gexprs.append((F.col(gm["col"]) % gm["m"]).alias("g_mod"))
    aggs = [agg_spark(a) for a in spec["aggs"]]
    out = df.groupBy(*gexprs).agg(*aggs) if gexprs else df.agg(*aggs)
    if "having_min_rows" in spec:
        out = out.filter(F.col("n_rows") >= spec["having_min_rows"])
    return out


def build_sql(spec: dict) -> str:
    t = spec["table"]
    frm = t
    conds = [f"({pred_sql(p)})" for p in spec["preds"]]
    if "pre_mod" in spec:
        pm = spec["pre_mod"]
        conds.append(f"({t}.{pm['col']} % {pm['m']} = {pm['r']})")
    if spec["join"]:
        _, rt, lk, rk = spec["join"]
        how = spec.get("join_how", "inner")
        if how == "inner":
            frm = f"{t} JOIN {rt} ON {t}.{lk} = {rt}.{rk}"
        elif how == "left":
            frm = f"{t} LEFT JOIN {rt} ON {t}.{lk} = {rt}.{rk}"
        else:  # semi / anti via (NOT) EXISTS — the decorrelated twin
            neg = "NOT " if how == "anti" else ""
            conds.append(
                f"{neg}EXISTS (SELECT 1 FROM {rt} WHERE {rt}.{rk} = {t}.{lk})"
            )
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    kind = spec["kind"]
    if kind == "distinct":
        return f"SELECT DISTINCT {', '.join(spec['cols'])} FROM {frm}{where}"
    if kind == "window":
        order = ", ".join(f"{c} ASC NULLS FIRST" for c in spec["cols"])
        over_ord = f"OVER (PARTITION BY {spec['part_col']} ORDER BY {order})"
        over_all = f"OVER (PARTITION BY {spec['part_col']})"
        sel = list(spec["cols"])
        for w in spec["wexprs"]:
            k, name = w["k"], w["name"]
            if k in ("row_number", "rank", "dense_rank"):
                # Spark's rank funcs return INT, DuckDB's BIGINT; value-
                # canon is str(int) so no cast needed for the hash, but
                # keep BIGINT explicit for schema readers.
                sel.append(f"{k.upper()}() {over_ord} AS {name}")
            elif k == "lag":
                sel.append(f"LAG({w['col']}, 1) {over_ord} AS {name}")
            elif k == "psum":
                sel.append(f"CAST(SUM({w['col']}) {over_all} AS BIGINT) AS {name}")
            elif k == "csum":
                sel.append(f"CAST(SUM({w['col']}) {over_ord} AS BIGINT) AS {name}")
        return f"SELECT {', '.join(sel)} FROM {frm}{where}"
    if kind == "project":
        sel = list(spec["cols"]) + [computed_sql(c) for c in spec.get("computed", [])]
        q = f"SELECT {', '.join(sel)} FROM {frm}{where}"
        if "order_limit" in spec:
            names = list(spec["cols"]) + [
                c["name"] for c in spec.get("computed", [])
            ]
            order = ", ".join(f"{c} ASC NULLS FIRST" for c in names)
            q += f" ORDER BY {order} LIMIT {spec['order_limit']}"
        return q
    gsel = list(spec["group_cols"])
    gby = list(spec["group_cols"])
    if "group_mod" in spec:
        gm = spec["group_mod"]
        gsel.append(f"({gm['col']} % {gm['m']}) AS g_mod")
        gby.append(f"({gm['col']} % {gm['m']})")
    sel = gsel + [agg_sql(a) for a in spec["aggs"]]
    q = f"SELECT {', '.join(sel)} FROM {frm}{where}"
    if gby:
        q += f" GROUP BY {', '.join(gby)}"
    if "having_min_rows" in spec:
        q += f" HAVING COUNT(*) >= {spec['having_min_rows']}"
    return q


# ---------------------------------------------------------------- runner ----


def run_case(spec, tables, con) -> dict | None:
    """Return a failure record, or None on match."""
    sdf = build_spark(spec, tables)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sql = build_sql(spec)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    fail = {}
    if len(srows) != len(orows):
        fail["rows"] = (len(srows), len(orows))
    if sorted(scols) != sorted(ocols):
        fail["schema"] = (sorted(scols), sorted(ocols))
    if not fail:
        h_s = frame_hash(scols, srows)
        h_o = frame_hash(ocols, orows)
        if h_s != h_o:
            fail["hash"] = (h_s, h_o)
    if fail:
        fail["spec"] = spec
        fail["sql"] = sql
        return fail
    return None


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("-") else "/root/testdata/sf0.01"
    n = int(args[args.index("--n") + 1]) if "--n" in args else 300
    if "--seeds" in args:
        seeds = [int(s) for s in args[args.index("--seeds") + 1].split(",")]
    else:
        seeds = [int(args[args.index("--seed") + 1]) if "--seed" in args else 11]
    window_cap = (
        int(args[args.index("--window-cap") + 1]) if "--window-cap" in args else 0
    )

    spark = get_spark(app_name="fuzz", conf={"spark.ui.enabled": "false"})
    tables = load_tables(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    stats = table_stats(con, sf_dir)

    failures = []
    t0 = time.time()
    total = 0
    fam_counts: dict = {}
    for seed in seeds:
        for i in range(n):
            total += 1
            rng = random.Random(seed * 1_000_003 + i)
            spec = gen_spec(rng, stats, window_cap=window_cap)
            fam_counts[spec["kind"]] = fam_counts.get(spec["kind"], 0) + 1
            try:
                fail = run_case(spec, tables, con)
            except Exception as exc:  # engine error is a finding too
                fail = {"spec": spec, "sql": build_sql(spec),
                        "error": repr(exc)[:500]}
            if fail:
                failures.append({"seed": seed, "case": i, **fail})
                print(f"FAIL seed {seed} case {i}: {json.dumps(fail)[:400]}")
            if (i + 1) % 10 == 0:
                print(f"  seed {seed}: {i + 1}/{n} cases,"
                      f" {len(failures)} failures, {time.time() - t0:.0f}s",
                      flush=True)
    out = {
        "seeds": seeds,
        "cases": total,
        # per-family counts (round-14 VERDICT item #2: FUZZ_X100.json
        # previously omitted them)
        "families": fam_counts,
        "sf_dir": sf_dir,
        "window_cap": window_cap,
        "failures": failures,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = args[args.index("--out") + 1] if "--out" in args else "FUZZ.json"
    with open(os.path.join(root, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{total} cases, {len(failures)} failures ({out['elapsed_sec']}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
