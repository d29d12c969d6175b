#!/usr/bin/env python
"""Deterministic scale-up tier generator (round-6 VERDICT item #1).

Replicates every /root/testdata table REP× (default 10: sf0.1 → ~sf1)
with key re-spreading so the scaled tier keeps the base tier's
statistical character instead of degenerating:

- every key domain is offset per replica by (max_key + 1), preserving
  referential integrity (orders↔lineitem, customer↔orders,
  part/supplier↔lineitem) and keeping keys unique — group counts,
  join fan-outs and dedup rates scale LINEARLY, the property a
  scale-sweep needs to measure super-linear surprises honestly;
- replica 0 is bit-identical to the base tier;
- document text is re-tokenized per replica (every token suffixed with
  the replica tag), so intra-replica duplicate/near-duplicate structure
  is isomorphic to the base corpus while cross-replica shingle sets are
  DISJOINT — without this, every doc gains REP-1 exact copies and the
  dedup workloads change character (component sizes, LSH bucket
  density) instead of scaling;
- embeddings are dimension-ROTATED per replica (a permutation: exact
  same norms and intra-replica geometry, decorrelated across replicas)
  for the same reason in cosine space;
- the small dims (region, nation) are copied as-is;
- timestamps are kept, so time-windowed workloads see REP× density
  over the same calendar range — the "bigger data, same period" read
  of scale-up.

Pure DuckDB (fast, single pass per table, no Spark session needed).

Usage: python tools/make_sfN.py [out_dir] [--rep N] [--base sf_dir] [--skew zipf]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> int:
    args = sys.argv[1:]
    out = args[0] if args and not args[0].startswith("-") else "/tmp/sparkgraft_sf1"
    rep = int(args[args.index("--rep") + 1]) if "--rep" in args else 10
    base = args[args.index("--base") + 1] if "--base" in args else "/root/testdata/sf0.1"
    skew = args[args.index("--skew") + 1] if "--skew" in args else None
    if skew not in (None, "zipf"):
        sys.exit(f"unknown --skew mode: {skew!r} (supported: zipf)")
    resume = "--resume" in args
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # Stream the COPY instead of materializing it: with order
    # preservation ON (the default), DuckDB buffers the ENTIRE result
    # before the first byte hits disk — at rep=1000 the lineitem COPY
    # held >90 GB RSS with a 0-byte output file before this was turned
    # off, vs a flat footprint streaming. Row ORDER in the scaled tier
    # is therefore nondeterministic (parallel writers), but every
    # CONSUMER of these tiers is order-insensitive (value-hash oracles
    # sort rows; the engine's own semantics never depend on file
    # order), and CONTENT stays exactly reproducible.
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET temp_directory='{out}/.duckdb_tmp'")

    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    def copy(sql: str, t: str) -> None:
        path = f"{out}/{t}.parquet"
        if resume and os.path.exists(path) and os.path.getsize(path) > 0:
            print(f"{t}: exists, skipped (--resume)")
            return
        # Stage through a sidecar and os.replace() on success (same
        # pattern as apply_zipf): COPY streams straight to disk, so a
        # run killed mid-COPY would otherwise leave a truncated file
        # that a later --resume silently accepts as complete.
        tmp = f"{out}/{t}.tmp.parquet"
        con.execute(
            f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{tmp}')").fetchone()[0]
        os.replace(tmp, path)
        # A fresh copy invalidates any prior zipf rewrite of this table.
        marker = _zipf_marker(out, t)
        if os.path.exists(marker):
            os.remove(marker)
        print(f"{t}: {n} rows")

    def dom(t: str, k: str) -> int:
        """Per-replica key offset = max+1 (keys stay unique, ranges disjoint)."""
        return int(con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0])

    o_off = dom("orders", "o_orderkey")
    c_off = dom("customer", "c_custkey")
    p_off = dom("part", "p_partkey")
    s_off = dom("supplier", "s_suppkey")
    d_off = dom("documents", "doc_id")
    v_off = dom("embeddings", "vec_id")
    e_off = dom("events", "event_id")
    u_off = dom("events", "user_id")

    rep_join = f"CROSS JOIN range({rep}) rp(r)"

    # dims: copied as-is (at 100 TB these stay broadcast-sized).
    copy(f"SELECT * FROM {src('region')}", "region")
    copy(f"SELECT * FROM {src('nation')}", "nation")

    copy(
        f"SELECT s_suppkey + r * {s_off} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {src('supplier')} {rep_join}",
        "supplier",
    )
    copy(
        f"SELECT p_partkey + r * {p_off} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM {src('part')} {rep_join}",
        "part",
    )
    copy(
        f"SELECT c_custkey + r * {c_off} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM {src('customer')} {rep_join}",
        "customer",
    )
    copy(
        f"SELECT o_orderkey + r * {o_off} AS o_orderkey, "
        f"o_custkey + r * {c_off} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM {src('orders')} {rep_join}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + r * {o_off} AS l_orderkey, "
        f"l_partkey + r * {p_off} AS l_partkey, "
        f"l_suppkey + r * {s_off} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')} {rep_join}",
        "lineitem",
    )
    copy(
        f"SELECT event_id + r * {e_off} AS event_id, ts, "
        f"user_id + r * {u_off} AS user_id, event_type, value, props "
        f"FROM {src('events')} {rep_join}",
        "events",
    )
    # text: replica 0 verbatim; others re-tokenized so cross-replica
    # shingles are disjoint. n_chars tracks the text delta so any
    # original offset convention is preserved.
    copy(
        f"""
        SELECT doc_id + r * {d_off} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          x -> x || 'q' || CAST(r AS VARCHAR)),
                           ' ')
               END AS text,
               lang, source,
               n_chars + (length(CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                           list_transform(string_split(text, ' '),
                                          x -> x || 'q' || CAST(r AS VARCHAR)),
                           ' ')
               END) - length(text)) AS n_chars
        FROM {src('documents')} {rep_join}
        """,
        "documents",
    )
    # embeddings: per-replica orthogonal transform = dimension rotation
    # (5r mod dim) composed with a sign-flip pattern keyed on r's bits
    # (flip dim i iff bit ((i - 1) mod 7) of r is set — i is 1-based
    # from generate_series, so the exponent is 0-based). Both are orthogonal
    # maps applied uniformly within a replica, so norms and
    # intra-replica cosine geometry are EXACT; cross-replica pairs
    # decorrelate. The sign-flip disambiguates replicas that share a
    # rotation (5r mod 64 repeats at r+64), so all transforms are
    # distinct for rep <= 128 — no duplicate vectors across replicas
    # (the rotation-only version duplicated pairs (r, r+64) at rep=100).
    copy(
        f"""
        SELECT vec_id + r * {v_off} AS vec_id,
               CAST(list_transform(generate_series(1, len(embedding)),
                    i -> embedding[((i - 1 + 5 * r) % len(embedding)) + 1]
                         * (1 - 2 * ((r // (1 << ((i - 1) % 7))) % 2)))
                    AS FLOAT[]) AS embedding,
               label
        FROM {src('embeddings')} {rep_join}
        """,
        "embeddings",
    )
    if skew == "zipf":
        apply_zipf(con, out)
    print(f"wrote {out} (rep={rep}, base={base}, skew={skew})")
    return 0


def _zipf_marker(out: str, t: str) -> str:
    """Sidecar recording that table ``t`` already got its zipf rewrite.

    Makes the skew step idempotent under --resume: re-applying the
    rank/hash rewrite to already-zipf keys would silently change the
    distribution vs a fresh run. copy() clears the marker whenever it
    rewrites the table, so only a genuinely-current rewrite is skipped.
    """
    return f"{out}/.zipf_done_{t}"


def apply_zipf(con, out: str) -> None:
    """Rewrite the fact-side join keys to a Zipf-like (log-uniform rank)
    distribution (round-10 VERDICT item #8): real 100 TB key frequencies
    are power-law, and the uniform-replication tiers can't expose the
    skew cliff in the join family.

    rank = clamp(floor(N^u), 1, N) with u a deterministic per-row hash
    uniform gives P(rank <= k) ≈ ln(k)/ln(N) — the hottest key draws
    ~ln(2)/ln(N) of ALL rows (≈5-7% at these tiers, i.e. a 1000×+
    overload vs the mean). Ranks map to the rank-th EXISTING key, so
    referential integrity holds and the registered oracle SQL still
    produces identical results on the skewed tier (both engines see the
    same data). Rewritten: lineitem.l_orderkey (orders-join family) and
    events.user_id (as-of / interval / session family). Dims untouched.
    """
    u64 = "1.8446744073709552e19"
    # Write to a sidecar then rename: these COPYs READ the file they
    # replace, which was only safe while COPY materialized its whole
    # input before opening the output — with streaming COPY
    # (preserve_insertion_order=false) an in-place rewrite would
    # truncate the scan's own source.
    if os.path.exists(_zipf_marker(out, "lineitem")):
        print("zipf lineitem: already skewed, skipped")
    else:
        _zipf_lineitem(con, out, u64)
    if os.path.exists(_zipf_marker(out, "events")):
        print("zipf events: already skewed, skipped")
    else:
        _zipf_events(con, out, u64)
    for t, k in (("lineitem", "l_orderkey"), ("events", "user_id")):
        mx, mean = con.execute(
            f"SELECT max(c), avg(c) FROM (SELECT count(*) AS c "
            f"FROM read_parquet('{out}/{t}.parquet') GROUP BY {k})"
        ).fetchone()
        print(f"zipf {t}.{k}: hottest key {mx} rows vs mean {mean:.1f}")


def _zipf_lineitem(con, out: str, u64: str) -> None:
    con.execute(
        f"""
        COPY (
          WITH ok AS (
            SELECT o_orderkey AS key,
                   row_number() OVER (ORDER BY o_orderkey) AS rn
            FROM read_parquet('{out}/orders.parquet')),
          n AS (SELECT count(*) AS n FROM ok),
          li AS (
            SELECT *, least(greatest(CAST(floor(pow(
                     (SELECT n FROM n),
                     hash(l_orderkey * 7919 + l_linenumber)::DOUBLE / {u64}
                   )) AS BIGINT), 1), (SELECT n FROM n)) AS __rnk
            FROM read_parquet('{out}/lineitem.parquet'))
          SELECT li.* EXCLUDE (__rnk) REPLACE (ok.key AS l_orderkey)
          FROM li JOIN ok ON ok.rn = li.__rnk
        ) TO '{out}/lineitem.zipf.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
        """
    )
    os.replace(f"{out}/lineitem.zipf.parquet", f"{out}/lineitem.parquet")
    open(_zipf_marker(out, "lineitem"), "w").close()


def _zipf_events(con, out: str, u64: str) -> None:
    con.execute(
        f"""
        COPY (
          WITH uk AS (
            SELECT user_id AS key,
                   row_number() OVER (ORDER BY user_id) AS rn
            FROM (SELECT DISTINCT user_id
                  FROM read_parquet('{out}/events.parquet'))),
          n AS (SELECT count(*) AS n FROM uk),
          ev AS (
            SELECT *, least(greatest(CAST(floor(pow(
                     (SELECT n FROM n),
                     hash(event_id)::DOUBLE / {u64}
                   )) AS BIGINT), 1), (SELECT n FROM n)) AS __rnk
            FROM read_parquet('{out}/events.parquet'))
          SELECT ev.* EXCLUDE (__rnk) REPLACE (uk.key AS user_id)
          FROM ev JOIN uk ON uk.rn = ev.__rnk
        ) TO '{out}/events.zipf.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
        """
    )
    os.replace(f"{out}/events.zipf.parquet", f"{out}/events.parquet")
    open(_zipf_marker(out, "events"), "w").close()


if __name__ == "__main__":
    sys.exit(main())
