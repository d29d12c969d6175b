#!/usr/bin/env python
"""Headline benchmark: run the engine's query battery at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Every query is timed under ``write.format("noop")`` — a blackhole sink
that materializes every output column, so the full final-projection cost
is paid (a bare ``count()`` lets Catalyst prune expensive final
projections and under-reports projection-heavy queries; that
count-based series was the r1-r9 legacy metric, retired in round 10
per the r8/r9 verdicts).

Headline pair (round-10 VERDICT item #4):

- ``value`` — raw noop-sink battery total (best-of-N per query);
- ``value_canary_normalized`` — the same total divided by
  ``canary_drift_noop``, the drift of a 10-query untouched canary
  subset (``cfg/bench_canary.json``) against its quiet-box reference.
  ~1.0 drift = quiet box; the normalized number is the round-over-round
  comparable one on this shared box (observed ±40% environmental
  swings).

A 1-minute loadavg above ``SPARK_GRAFT_BENCH_MAX_LOAD`` (default 8.0)
is flagged as ``"env_hot": true`` in the artifact and warned on stderr;
set ``SPARK_GRAFT_BENCH_REFUSE=1`` to make that a hard exit instead
(the default stays soft so the driver's per-round run always yields a
line).

Usage: python bench.py [--config harness.yml]
(YAML keys: sf_dir, bench_rounds, queries — see config.HarnessConfig.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ska_src_maltopuft_etl_spark.config import load_harness_config
from ska_src_maltopuft_etl_spark.engine import get_spark, release_all_persisted
from ska_src_maltopuft_etl_spark.plans import QUERIES


def main() -> None:
    cfg_path = None
    if "--config" in sys.argv:
        cfg_path = sys.argv[sys.argv.index("--config") + 1]
    cfg = load_harness_config(cfg_path)
    sf_dir = cfg.sf_dir
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    # Quiesce check (round-7 VERDICT #3a): two rounds of
    # battery-to-battery deltas turned out to be co-tenant processes,
    # not code. The numbers go in the final JSON so the JUDGE can see
    # the environment, not just us.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "8.0"))
    load_start = os.getloadavg()[0]
    env_hot = load_start > max_load
    if env_hot:
        print(
            f"[bench] WARNING: 1-min loadavg {load_start:.1f} > {max_load} "
            f"at start — box is not quiet; totals will not be comparable "
            f"(set SPARK_GRAFT_BENCH_REFUSE=1 to abort instead)",
            file=sys.stderr, flush=True,
        )
        if os.environ.get("SPARK_GRAFT_BENCH_REFUSE") == "1":
            print(json.dumps({
                "metric": "total_query_battery_noop_sink_sec",
                "value": None,
                "refused": f"loadavg_start {load_start:.2f} > {max_load}",
            }))
            sys.exit(3)

    spark = get_spark(app_name="bench", conf={"spark.ui.enabled": "false"})

    # Warm the JVM / codegen / parquet footer caches so the first timed
    # query doesn't absorb session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    next(iter(QUERIES.values())).fn(spark, sf_dir).count()

    specs = {
        k: v
        for k, v in QUERIES.items()
        if not cfg.queries or k in set(cfg.queries)
    }

    # Per-query time = best of N full executions (default 3; round-5
    # judge item #4 — min-of-2 still let ±8-10% battery noise swamp
    # real code deltas). Min-of-N is the standard steady-state
    # estimator; each round still executes the complete plan from the
    # parquet scan up (cache cleared between).
    rounds = cfg.bench_rounds
    timings_noop: dict[str, float] = {}
    for name, spec in specs.items():
        # progress marker on stderr (stdout stays machine-parseable;
        # the driver keeps only the final stdout line): long scaled-tier
        # batteries die mid-run on resource walls, and without this the
        # failing QUERY is unidentifiable from stage numbers alone.
        print(f"[bench] {name}", file=sys.stderr, flush=True)
        best_noop = None
        for _ in range(rounds):
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best_noop = elapsed if best_noop is None else min(best_noop, elapsed)
            # queries are independent; drop any intermediates a query
            # pinned so later timings aren't distorted by cache/GC
            # pressure. clearCache only unpins catalog-cached frames —
            # localCheckpoint RDDs (the iterative/certification queries
            # use ~18 of them) live in RDD storage and otherwise
            # accumulate across the battery, degrading every later
            # query via GC pressure (measured +40% battery drift).
            release_all_persisted(spark)
        timings_noop[name] = round(best_noop, 3)
    total_noop = round(sum(timings_noop.values()), 3)
    load_end = os.getloadavg()[0]

    # Canary drift (round-7 VERDICT #3b): sum of the 10 untouched
    # canary queries vs their quiet-box reference. ~1.0 = quiet box,
    # comparable battery; >>1.0 = environmental inflation — the
    # normalized total divides it out.
    canary_drift_noop = None
    total_normalized = None
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "cfg", "bench_canary.json")
        ) as f:
            canary = json.load(f)
        ref_n = canary["reference_noop_sec"]
        if all(k in timings_noop for k in ref_n):
            canary_drift_noop = round(
                sum(timings_noop[k] for k in ref_n) / sum(ref_n.values()), 3
            )
            total_normalized = round(total_noop / canary_drift_noop, 3)
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        pass
    # Round 2 postmortem: the single-line JSON with all per-query
    # timings outgrew the driver's tail capture and the headline line was
    # truncated away ("parsed": null in BENCH_r02.json). Emit the full
    # map on its own (non-final) line for humans/archives, then a SHORT
    # final JSON line — same contract keys, but "queries" bounded to the
    # slowest 12 so the line stays well under any tail-capture limit.
    full = {
        "metric": "per_query_wall_sec_full",
        "queries_noop_sink": timings_noop,
        "canary_drift_noop": canary_drift_noop,
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(load_end, 2),
        "env_hot": env_hot,
        "sf": sf_val,
        "rounds": rounds,
        "config": cfg_path,
    }
    print(json.dumps(full))
    # Also archive in-repo so every round's full battery is diffable
    # (the driver's BENCH_r{N}.json keeps only the final line). Subset
    # runs (--config queries: [...]) must not clobber the archive.
    if not cfg.queries:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json"), "w"
            ) as f:
                json.dump(full, f, indent=1, sort_keys=True)
        except OSError:
            pass
    slowest = dict(
        sorted(timings_noop.items(), key=lambda kv: kv[1], reverse=True)[:12]
    )
    print(
        json.dumps(
            {
                # PRIMARY metric since round 8: noop-sink total — every
                # output column materialized, final projections paid.
                # (count_total_sec_legacy retired in round 10.)
                "metric": "total_query_battery_noop_sink_sec",
                "value": total_noop,
                "unit": "sec",
                # The round-over-round comparable number on a shared
                # box: raw total divided by untouched-canary drift.
                "value_canary_normalized": total_normalized,
                "canary_drift_noop": canary_drift_noop,
                "loadavg_start": round(load_start, 2),
                "loadavg_end": round(load_end, 2),
                "env_hot": env_hot,
                "queries": slowest,
                "n_queries": len(timings_noop),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
