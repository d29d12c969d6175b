#!/usr/bin/env python
"""Seeded differential fuzzer for the STREAMING twins (round-13 VERDICT
item #1): replay generated multi-batch datasets through the availableNow
paths of streaming/ingest.py and hash-compare each against an
independent batch computation of the same semantics.

tools/fuzz_intervals.py fuzzes the batch operator family (and found two
real bugs in its first 50 cases); the streaming equivalents were until
now certified only on the fixed flagship dataset shapes
(STREAM_EQUIV*.json). This tool generates the fixture-blind class:
NULL keys / NULL event times / NULL values, duplicate timestamps, rows
at exactly the watermark boundary, consecutive events exactly one gap
apart, band-edge pairs (r_ts == l_ts + band), sealing-boundary sessions
(end + gap == final watermark), zipf keys, empty micro-batches, and
cross-batch out-of-order arrival (rows displaced one time-block later).

Families and their batch twins:

- ``dedup``     — stream_with_watermark_dedup(event_id) vs batch
                  dropDuplicates; duplicates are EXACT row copies (so
                  "which copy survives" cannot differ) and always arrive
                  within the watermark horizon (delay >= one block, the
                  displacement bound — see no-late proof below).
- ``sessionize``— sessionize_events (applyInPandasWithState, event-time
                  timeout) vs a window-lag gap split filtered to
                  watermark-SEALED sessions (end + gap < final wm,
                  strict — the operator's own split_sealed convention).
                  The twin's cumulative-sum pass uses the default RANGE
                  frame, so duplicate-timestamp rows share one session
                  id deterministically (round-10 oracle lesson).
- ``join_inner``/``join_louter`` — join_event_streams (band-bucketed
                  watermarked stream-stream interval join) vs a batch
                  non-equi join; for leftOuter the twin keeps a
                  null-extension only when the FINAL watermark sealed
                  its band (ts + band < wm, strict). A NULL-ts left row
                  never seals (NULL predicate → excluded), matching the
                  stream, whose state never releases it.

No-late-rows guarantee (what makes plain batch twins exact): a row's
arrival block is its natural time block, +1 with p=0.25. At any batch b
the watermark is max{ts of earlier-arriving rows} - delay, and every
earlier-arriving row has ts < row_ts + block_len, so with
delay >= block_len the watermark never passes an arriving row's event
time. Engineered ``boundary`` pairs sit at EXACTLY ts == wm (anchor at
max_ts, probe at max_ts - delay one block later) — Spark keeps rows at
the watermark (ts >= wm), and the twin keeps them unconditionally, so a
divergence here would expose an off-by-one in either engine's boundary.

Hash-stability rules: event times are whole seconds on a coarse grid
(multiples of gap/2 or band/2 — boundary collisions by construction);
values are multiples of 0.25 (exact in binary, any summation order);
timestamps are compared as unix_micros longs; both sides read the same
parquet through the same session (timezone cancels).

Restart coverage: the default mix includes the deterministic two-phase
cold restart (35% of eligible cases); ``--force-racy`` instead drains
EVERY case through a kill-mid-batch restart (random in-flight
``stop()`` via timer or completed-batch trigger, restart on the same
checkpoint + parquet sink — see run_racy). ``--provider hdfs`` replays
on the HDFS-backed state store (default: RocksDB).

Usage: python tools/fuzz_stream.py [--n N] [--seed S | --seeds A,B,..]
                                   [--out FUZZ_STREAM.json]
                                   [--force-racy] [--provider hdfs]
Writes FUZZ_STREAM.json at the repo root; exit 1 on any divergence.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa
import pyarrow.parquet as pq

from tools.check_correctness import frame_hash

BASE = dt.datetime(2024, 1, 1)

EVENT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("value", pa.float64()),
    ]
)
EVENT_DDL = "event_id long, user_id long, ts timestamp, value double"


def _t(seconds):
    return None if seconds is None else BASE + dt.timedelta(seconds=int(seconds))


def _key(rng: random.Random, n_k: int, zipf: bool, p_null: float):
    if rng.random() < p_null:
        return None
    if zipf and n_k > 1:
        return rng.randrange(rng.randrange(n_k) + 1)
    return rng.randrange(n_k)


# -------------------------------------------------------------- generation --


def gen_case(rng: random.Random) -> dict:
    family = rng.choice(
        ["sessionize", "sessionize", "dedup", "join_inner", "join_louter"]
    )
    n_k = rng.randint(1, 6)
    zipf = rng.random() < 0.4
    blocks = rng.randint(1, 5)
    case = {"family": family, "n_k": n_k, "zipf": zipf, "blocks": blocks}

    if family == "sessionize":
        gap_minutes = rng.choice([5, 30])
        gap_s = gap_minutes * 60
        # window sized in gaps so sessions both split and merge
        window = gap_s * rng.randint(4, 30)
        grid = rng.choice([1, gap_s // 2, gap_s])
        case.update(gap_minutes=gap_minutes, window=window, grid=grid)
    elif family == "dedup":
        window = rng.choice([3600, 86400])
        grid = rng.choice([1, 60])
        case.update(window=window, grid=grid)
    else:
        band = rng.choice([60, 300])
        window = band * rng.randint(4, 40)
        grid = rng.choice([1, band // 2, band])
        case.update(band=band, window=window, grid=grid)

    block_len = window // blocks + 1
    # delay >= block_len: the no-late guarantee (module docstring)
    case["delay_s"] = block_len * rng.choice([1, 1, 2]) + (
        0 if rng.random() < 0.5 else rng.randrange(block_len)
    )
    case["boundary"] = blocks >= 2 and rng.random() < 0.4
    # two_phase (round-13 extension): a deterministic cold-restart —
    # phase 1 stages only the first half of the blocks and drains to a
    # parquet sink under availableNow; phase 2 adds the remaining block
    # files and restarts on the SAME checkpoint + sink. State (open
    # sessions, dedup keys, join buffers, watermark) must survive the
    # restart byte-exactly: the combined output is compared against the
    # same single-run batch twin. No kill-timing race — the phase
    # boundary is exact.
    case["two_phase"] = blocks >= 2 and rng.random() < 0.35

    def rows_for(n, p_null_key, p_null_ts, p_null_val):
        out = []
        for i in range(n):
            ts = None if rng.random() < p_null_ts else (
                rng.randrange(window // case["grid"] + 1) * case["grid"]
            )
            val = None if rng.random() < p_null_val else rng.randrange(101) / 4.0
            out.append((i, _key(rng, n_k, zipf, p_null_key), ts, val))
        return out

    if family in ("join_inner", "join_louter"):
        case["left"] = rows_for(rng.randint(0, 60), 0.05, 0.04, 0.05)
        case["right"] = rows_for(rng.randint(0, 60), 0.05, 0.04, 0.05)
    else:
        case["rows"] = rows_for(rng.randint(0, 120), 0.05, 0.04, 0.08)
        # Cross-batch exact duplicates (the dedup family's point; extra
        # same-content events for the others — both engines see both).
        # NULL-event-time rows are never duplicated in the dedup family:
        # Spark expires a NULL-time dedup state entry once the watermark
        # passes the delay (observed: a NULL-ts duplicate arriving 3
        # blocks after its original re-emitted while adjacent-block
        # NULL-ts duplicates deduped fine), and NULL-ts rows carry no
        # lateness bound, so the plain-dropDuplicates twin cannot model
        # them. They stay in the row pool as single pass-through probes.
        dup_pool = (
            [r for r in case["rows"] if r[2] is not None]
            if family == "dedup" else case["rows"]
        )
        case["dups"] = [
            r for r in dup_pool if rng.random() < (0.3 if family == "dedup" else 0.1)
        ]
        if family == "dedup" and rng.random() < 0.3:
            # NULL dedup-key clones: every NULL-event_id row in a case is
            # the SAME content, so "NULLs collapse to one row" has a
            # unique answer in both engines
            clone = (None, rng.randrange(n_k), 0, 1.25)
            case["rows"] += [clone] * rng.randint(2, 3)
    return case


def assign_blocks(rng, rows, window, blocks):
    """(row, arrival_block): natural time block, +1 with p=0.25 (NULL-ts
    rows get a uniform block — they carry no lateness)."""
    block_len = window // blocks + 1
    out = []
    for r in rows:
        ts = r[2]
        nat = rng.randrange(blocks) if ts is None else min(ts // block_len, blocks - 1)
        b = min(nat + (1 if rng.random() < 0.25 else 0), blocks - 1)
        out.append((r, b))
    return out


def stage(rows_with_blocks, blocks, split=None):
    """Write per-block parquet files (oldest-first mtimes). With
    ``split=k`` only blocks < k are written now; the returned ``finish``
    callable writes the rest (the two-phase restart's phase boundary).
    Returns (dir, finish)."""
    d = tempfile.mkdtemp(prefix="fzs_")
    now = time.time()
    per_block: list[list] = [[] for _ in range(blocks)]
    for (eid, k, ts, val), b in rows_with_blocks:
        per_block[b].append((eid, k, _t(ts), val))

    def write(i):
        rows = per_block[i]
        cols = list(zip(*rows)) if rows else [[], [], [], []]
        tbl = pa.table(
            {f.name: pa.array(list(c), type=f.type) for f, c in zip(EVENT_SCHEMA, cols)},
            schema=EVENT_SCHEMA,
        )
        p = os.path.join(d, f"b{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now - 3600 + i, now - 3600 + i))

    for i in range(blocks if split is None else split):
        write(i)

    def finish():
        if split is not None:
            for i in range(split, blocks):
                write(i)

    return d, finish


def renumber(rows, start):
    """Globally unique event ids (duplicates keep their source row's id)."""
    mapping = {}
    out = []
    nxt = start
    for r in rows:
        if r[0] is None:
            out.append(r)
            continue
        if r[0] not in mapping:
            mapping[r[0]] = nxt
            nxt += 1
        out.append((mapping[r[0]], *r[1:]))
    return out, nxt


# --------------------------------------------------------------- execution --

_CASE_SEQ = [0]


def run_stream(spark, df) -> str:
    name = f"fz_stream_{_CASE_SEQ[0]}"
    _CASE_SEQ[0] += 1
    ckpt = tempfile.mkdtemp(prefix="fzs_ck_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    ok = q.awaitTermination(300)
    shutil.rmtree(ckpt, ignore_errors=True)
    if not ok:
        q.stop()
        raise RuntimeError("streaming query did not terminate in 300s")
    return name


def run_racy(make_df, rng: random.Random, finishers) -> tuple[str, str, int]:
    """Kill-during-batch restart (round-14 VERDICT item #1): drain the
    fully-staged files to a parquet sink under availableNow, but kill
    the query at a racy in-flight point — a uniform wall-clock timer or
    a completed-batch-count trigger (which lands the ``stop()`` inside
    the NEXT batch's planning/execution) — then restart on the SAME
    checkpoint + sink, possibly kill again, and finally run to
    completion. Unlike the deterministic ``two_phase`` family there is
    NO clean phase boundary: the kill can interrupt state-store
    commits, offset-log writes, or the sink's file commit. Correctness
    rests on the exactly-once contract this engine's batch loads model
    (reference core/database_loader.py:159-189): the FileStreamSink's
    _spark_metadata commit log masks orphaned files from aborted
    batches, and checkpoint recovery replays the interrupted batch —
    so the committed output must hash-equal the single-run batch twin.
    Returns (sink, ckpt, n_kills); caller reads the sink (the batch
    reader honors _spark_metadata) and removes both dirs."""
    sink = tempfile.mkdtemp(prefix="fzs_rsink_")
    ckpt = tempfile.mkdtemp(prefix="fzs_rck_")

    def start():
        return (
            make_df().writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    from pyspark.errors import StreamingQueryException

    from ska_src_maltopuft_etl_spark.streaming import clear_aborted_batch0

    kills = 0
    recoveries = 0
    for _ in range(rng.randint(1, 2)):
        q = start()
        try:
            if rng.random() < 0.5:
                done = q.awaitTermination(rng.uniform(0.2, 3.0))
            else:
                target = rng.randint(0, 4)
                done, t0 = False, time.time()
                while not done and time.time() - t0 < 120:
                    done = q.awaitTermination(0.05)
                    lp = q.lastProgress
                    if lp is not None and lp["batchId"] >= target:
                        break
        except StreamingQueryException as exc:
            if "STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY" in str(exc):
                # round-14 finding #2: the PREVIOUS kill interrupted the
                # batch-0 offset-log write; with zero committed entries
                # the restart treats the query as new and refuses the
                # non-empty offsets dir. Apply the production remedy
                # (streaming/recovery.py) — provably exactly-once-safe
                # because nothing was ever committed — and keep going.
                if not clear_aborted_batch0(ckpt, sink_path=sink):
                    raise RuntimeError(
                        f"batch0 recovery preconditions failed: {exc}"
                    ) from exc
                recoveries += 1
                continue
            # the query died WITHOUT a stop() this attempt — a genuine
            # restart-recovery failure, not kill noise: a finding
            raise RuntimeError(f"racy attempt crashed pre-kill: {exc}") from exc
        if not done:
            q.stop()
            # The restart must not race the dying query's checkpoint
            # lock — wait for full termination. stop() cancels the
            # in-flight batch, and Spark sometimes records that
            # cancellation as the query's exception (a race between the
            # job-cancel error and the stop flag); that kill-induced
            # failure is expected noise, NOT a finding — correctness is
            # judged on the final clean run + the committed sink.
            try:
                q.awaitTermination(120)
            except StreamingQueryException:
                pass
            kills += 1
    # The flush-sentinel block is written only NOW, after the kill
    # phase: a kill can land after the last data batch committed but
    # before the no-data flush batch, losing that batch's watermark
    # advance (it is persisted only in the NEXT offset entry) — if the
    # sentinel were already consumed by a killed run, the final clean
    # run would see no new data, restore the stale watermark, and
    # terminate without emitting watermark-gated output (sealed
    # sessions, leftOuter null-extensions). Deferring the sentinel
    # guarantees the final run always processes >= 1 fresh row, always
    # re-derives the watermark past everything, and always runs the
    # flush batch — closing the window deterministically while leaving
    # the kill race itself fully exercised on the data batches.
    for fin in finishers:
        fin()
    q = start()
    try:
        ok = q.awaitTermination(300)
    except StreamingQueryException as exc:
        if "STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY" in str(
            exc
        ) and clear_aborted_batch0(ckpt, sink_path=sink):
            recoveries += 1
            q = start()
            try:
                ok = q.awaitTermination(300)
            except StreamingQueryException as exc2:
                raise RuntimeError(
                    f"racy FINAL run crashed after batch0 recovery: {exc2}"
                ) from exc2
        else:
            raise RuntimeError(f"racy FINAL run crashed: {exc}") from exc
    if not ok:
        q.stop()
        raise RuntimeError("racy-restart final run did not terminate in 300s")
    return sink, ckpt, kills, recoveries


def run_two_phase(make_df, finishers) -> tuple[str, str]:
    """Cold-restart-from-checkpoint: drain the phase-1 files into a
    parquet sink, stop (availableNow terminates), write the phase-2
    files, restart on the SAME checkpoint + sink. Returns (sink, ckpt);
    caller reads the sink and removes both."""
    sink = tempfile.mkdtemp(prefix="fzs_sink_")
    ckpt = tempfile.mkdtemp(prefix="fzs_ck2_")

    def drain():
        q = (
            make_df().writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        ok = q.awaitTermination(300)
        if not ok:
            q.stop()
            raise RuntimeError("two-phase query did not terminate in 300s")

    drain()
    for fin in finishers:
        fin()
    drain()
    return sink, ckpt


def reader(spark, d):
    return (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )


def hash_of(df) -> tuple[int, str]:
    rows = [tuple(r) for r in df.collect()]
    return len(rows), frame_hash(df.columns, rows)


BASE_EPOCH_US = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def final_wm_us(rows, delay_s) -> int | None:
    """Final event-time watermark as epoch-µs (comparable to
    unix_micros): max ts (ms-truncated; the whole-second grid makes this
    exact) minus the delay. None if no timed rows."""
    tss = [r[2] for r in rows if r[2] is not None]
    if not tss:
        return None
    return BASE_EPOCH_US + (max(tss) - delay_s) * 1_000_000


def run_case(spec: dict, spark) -> dict | None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ska_src_maltopuft_etl_spark.streaming import (
        join_event_streams,
        sessionize_events,
        stream_with_watermark_dedup,
    )

    assign_seed = spec.pop("__assign_seed")
    rng = random.Random(assign_seed)
    # independent stream for kill timing: the racy family's whole point
    # is that WHEN the kill lands is decoupled from WHAT was generated
    kill_rng = random.Random(assign_seed ^ 0x5EED)
    family, blocks, window = spec["family"], spec["blocks"], spec["window"]
    delay = spec["delay_s"]
    wm_str = f"{delay} seconds"
    # boundary pairs live in TWO RESERVED TRAILING BLOCKS (anchor, then
    # probe): an anchor mid-stream would make every normal row arriving
    # after it genuinely late (ts < anchor - delay) and break the
    # plain-batch-twin equivalence. In the reserved blocks nothing
    # arrives after the anchor except the probe itself, which sits at
    # EXACTLY the watermark (kept: Spark's late filter is ts >= wm).
    total_blocks = blocks + (2 if spec["boundary"] else 0)
    # Racy-restart flush sentinel (round-14 finding, diagnosed
    # state-INTACT via a watermark-nudge probe): Spark persists a
    # batch's watermark advance only in the NEXT offset-log entry, so a
    # kill landing after the last data batch but before the final
    # no-data flush batch loses that advance — the restarted
    # availableNow run restores the previous watermark, sees no new
    # data, and terminates WITHOUT emitting the leftOuter
    # null-extensions / sealed sessions the ideal final watermark
    # covers. The rows are delayed, not lost (appending a far-future
    # row and re-running the same checkpoint emitted every one), which
    # is documented watermark semantics: emission is deferred to the
    # next run with data. The twin models the ideal final watermark, so
    # racy cases append ONE sentinel row (far-future ts, last block,
    # both sides for joins) that every engine sees — the final clean
    # run then has new data, re-derives the watermark past everything,
    # and flushes deterministically; the kill race itself is untouched.
    racy = bool(spec.get("racy"))
    sent_ts = (
        window + 2 * delay + 2 * spec["grid"] + spec.get("band", 0) + 3600
    )
    if racy:
        total_blocks += 1
    dirs, views = [], []

    def boundary_pair(nxt):
        if not spec["boundary"]:
            return [], nxt
        anchor_ts = window + delay + spec["grid"]
        probe_ts = anchor_ts - delay
        pair = [
            ((nxt, rng.randrange(spec["n_k"]), anchor_ts, 0.25), blocks),
            ((nxt + 1, rng.randrange(spec["n_k"]), probe_ts, 0.5), blocks + 1),
        ]
        return pair, nxt + 2

    try:
        if family in ("join_inner", "join_louter"):
            lrows, nxt = renumber(spec["left"], 0)
            rrows, nxt = renumber(spec["right"], nxt)
            lwb = assign_blocks(rng, lrows, window, blocks)
            rwb = assign_blocks(rng, rrows, window, blocks)
            # the global watermark is the MIN over both sides, so the
            # anchor must raise both: mirror it onto the right side too
            extra, nxt = boundary_pair(nxt)
            lwb += extra
            lrows = lrows + [r for r, _ in extra]
            if extra:
                (aid, ak, ats, av), ab = extra[0]
                r_anchor = ((nxt, ak, ats, av), ab)
                nxt += 1
                rwb.append(r_anchor)
                rrows = rrows + [r_anchor[0]]
            if racy:
                # flush sentinel on BOTH sides (global wm = min over
                # sides); far beyond every row + band, so it matches
                # only its own mirror — both engines model it
                s_l = ((9_000_000, 0, sent_ts, 0.25), total_blocks - 1)
                s_r = ((9_000_001, 0, sent_ts, 0.25), total_blocks - 1)
                lwb.append(s_l)
                lrows = lrows + [s_l[0]]
                rwb.append(s_r)
                rrows = rrows + [s_r[0]]
            if racy:
                split = total_blocks - 1  # sentinel block deferred
            else:
                split = max(1, total_blocks // 2) if spec["two_phase"] else None
            dl, fin_l = stage(lwb, total_blocks, split)
            dr, fin_r = stage(rwb, total_blocks, split)
            dirs += [dl, dr]
            how = "inner" if family == "join_inner" else "leftOuter"
            band = spec["band"]

            def make_join():
                sl = reader(spark, dl).select(
                    "user_id", "ts", F.col("event_id").alias("l_event")
                )
                sr = reader(spark, dr).select(
                    "user_id", F.col("ts").alias("r_ts"),
                    F.col("event_id").alias("r_event"),
                )
                return join_event_streams(
                    sl, sr, key="user_id", left_ts="ts", right_ts="r_ts",
                    band_seconds=band, watermark=wm_str, how=how,
                ).select("l_event", "r_event")

            if spec.get("racy") or spec["two_phase"]:
                if spec.get("racy"):
                    sink, ck2, spec["kills"], spec["b0_rec"] = run_racy(
                        make_join, kill_rng, [fin_l, fin_r]
                    )
                else:
                    sink, ck2 = run_two_phase(make_join, [fin_l, fin_r])
                dirs += [sink, ck2]
                got = spark.read.schema("l_event long, r_event long").parquet(sink)
            else:
                view = run_stream(spark, make_join())
                views.append(view)
                got = spark.sql(f"SELECT l_event, r_event FROM {view}")

            bl = spark.read.schema(EVENT_DDL).parquet(dl).select(
                "user_id", "ts", F.col("event_id").alias("l_event")
            )
            br = spark.read.schema(EVENT_DDL).parquet(dr).select(
                F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
                F.col("event_id").alias("r_event"),
            )
            cond = (
                (bl["user_id"] == br["r_user"])
                & (br["r_ts"] >= bl["ts"])
                & (br["r_ts"] <= bl["ts"] + F.expr(f"INTERVAL {band} SECONDS"))
            )
            if how == "inner":
                twin = bl.join(br, cond).select("l_event", "r_event")
            else:
                # global watermark = min over both sides' watermarks
                wm_l = final_wm_us(lrows, delay)
                wm_r = final_wm_us(rrows, delay)
                wm = min(
                    (w for w in (wm_l, wm_r) if w is not None),
                    default=None,
                )
                if wm_l is None or wm_r is None:
                    wm = None  # a silent side pins the global wm at epoch 0
                sealed = (
                    F.unix_micros("ts") + F.lit(band * 1_000_000) < F.lit(wm)
                    if wm is not None
                    else F.lit(False)
                )
                twin = (
                    bl.join(br, cond, "left")
                    .where(F.col("r_event").isNotNull() | sealed)
                    .select("l_event", "r_event")
                )
        else:
            # duplicates reuse the ORIGINAL ids: renumber both from the
            # same source list so ids align
            all_rows, nxt = renumber(spec["rows"] + spec.get("dups", []), 0)
            rows = all_rows[: len(spec["rows"])]
            dups = all_rows[len(spec["rows"]):]
            rwb = assign_blocks(rng, rows, window, blocks)
            # Each duplicate lands EXACTLY one block after its natural
            # block — never later. Chaining the +1 onto assign_blocks'
            # own random +1 displacement allowed a duplicate to arrive
            # two blocks late, and with delay == block_len the first
            # copy's dedup state (expiry = ts + delay, evicted once
            # wm > that) expired before the duplicate arrived —
            # dropDuplicatesWithinWatermark then RE-EMITS, which is its
            # documented contract ("dropped if they arrive within the
            # watermark delay"), not a bug. The twin models only
            # within-horizon duplicates, so the generator must keep
            # every duplicate inside the horizon: displacement <= 1
            # block and delay >= block_len give, at the duplicate's
            # batch, wm <= ts + block_len - delay <= ts < ts + delay.
            # (First fuzz run's finding — 6/210 divergences, all this.)
            block_len = window // blocks + 1
            dwb = []
            for r in dups:
                nat = (
                    rng.randrange(blocks) if r[2] is None
                    else min(r[2] // block_len, blocks - 1)
                )
                dwb.append((r, min(nat + 1, blocks - 1)))
            extra, _ = boundary_pair(nxt)
            allwb = rwb + dwb + extra
            if racy:
                # flush sentinel: unique id (dedup passes it through),
                # far-future ts (sessionize opens a new never-emitted
                # session for user 0 in BOTH engines)
                allwb = allwb + [((9_000_000, 0, sent_ts, 0.25), total_blocks - 1)]
            full = [r for r, _ in allwb]
            if racy:
                split = total_blocks - 1  # sentinel block deferred
            else:
                split = max(1, total_blocks // 2) if spec["two_phase"] else None
            d, fin = stage(allwb, total_blocks, split)
            dirs.append(d)

            if family == "dedup":
                def make_dedup():
                    return stream_with_watermark_dedup(
                        reader(spark, d), "ts", ["event_id"], watermark=wm_str
                    )

                if spec.get("racy") or spec["two_phase"]:
                    if spec.get("racy"):
                        sink, ck2, spec["kills"], spec["b0_rec"] = run_racy(
                            make_dedup, kill_rng, [fin]
                        )
                    else:
                        sink, ck2 = run_two_phase(make_dedup, [fin])
                    dirs += [sink, ck2]
                    got = spark.read.schema(EVENT_DDL).parquet(sink).select(
                        "event_id", "user_id",
                        F.unix_micros("ts").alias("ts_us"), "value",
                    )
                else:
                    view = run_stream(spark, make_dedup())
                    views.append(view)
                    got = spark.sql(
                        f"SELECT event_id, user_id, unix_micros(ts) AS ts_us, "
                        f"value FROM {view}"
                    )
                # twin reads AFTER the stream ran: phase-2 files must be
                # on disk before the batch file index is built
                batch = spark.read.schema(EVENT_DDL).parquet(d)
                twin = batch.dropDuplicates(["event_id"]).select(
                    "event_id", "user_id",
                    F.unix_micros("ts").alias("ts_us"), "value",
                )
            else:
                gap_min = spec["gap_minutes"]
                gap_us = gap_min * 60 * 1_000_000

                def make_sess():
                    return sessionize_events(
                        reader(spark, d), gap_minutes=gap_min, watermark=wm_str
                    )

                if spec.get("racy") or spec["two_phase"]:
                    if spec.get("racy"):
                        sink, ck2, spec["kills"], spec["b0_rec"] = run_racy(
                            make_sess, kill_rng, [fin]
                        )
                    else:
                        sink, ck2 = run_two_phase(make_sess, [fin])
                    dirs += [sink, ck2]
                    got = spark.read.schema(
                        "user_id long, session_start timestamp, "
                        "session_end timestamp, n_events int, "
                        "total_value double"
                    ).parquet(sink).select(
                        "user_id",
                        F.unix_micros("session_start").alias("s_us"),
                        F.unix_micros("session_end").alias("e_us"),
                        "n_events", "total_value",
                    )
                else:
                    view = run_stream(spark, make_sess())
                    views.append(view)
                    got = spark.sql(
                        f"SELECT user_id, unix_micros(session_start) AS s_us, "
                        f"unix_micros(session_end) AS e_us, n_events, "
                        f"total_value FROM {view}"
                    )
                batch = spark.read.schema(EVENT_DDL).parquet(d)
                wm = final_wm_us(full, delay)
                ev = batch.where(F.col("ts").isNotNull())
                w = Window.partitionBy("user_id").orderBy("ts")
                ses = (
                    ev.withColumn("ts_us", F.unix_micros("ts"))
                    .withColumn("prev_us", F.lag("ts_us").over(w))
                    .withColumn(
                        "new_s",
                        F.when(
                            F.col("prev_us").isNull()
                            | (F.col("ts_us") - F.col("prev_us") > F.lit(gap_us)),
                            1,
                        ).otherwise(0),
                    )
                    # default RANGE frame: duplicate-ts rows share an id
                    .withColumn("sid", F.sum("new_s").over(w))
                    .groupBy("user_id", "sid")
                    .agg(
                        F.min("ts_us").alias("s_us"),
                        F.max("ts_us").alias("e_us"),
                        F.count("*").cast("int").alias("n_events"),
                        F.coalesce(F.sum("value"), F.lit(0.0)).alias("total_value"),
                    )
                    .where(
                        F.col("e_us") + F.lit(gap_us) < F.lit(wm)
                        if wm is not None
                        else F.lit(False)
                    )
                    .select("user_id", "s_us", "e_us", "n_events", "total_value")
                )
                twin = ses

        n_g, h_g = hash_of(got)
        n_t, h_t = hash_of(twin)
        if (n_g, h_g) != (n_t, h_t):
            return {
                "stream": {"rows": n_g, "hash": h_g},
                "twin": {"rows": n_t, "hash": h_t},
                "spec": {
                    k: v for k, v in spec.items()
                    if k not in ("rows", "dups", "left", "right")
                },
                "sizes": {
                    k: len(spec[k])
                    for k in ("rows", "dups", "left", "right") if k in spec
                },
            }
        return None
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        for v in views:
            spark.catalog.dropTempView(v)


def main() -> int:
    from ska_src_maltopuft_etl_spark.engine import get_spark

    args = sys.argv[1:]
    n = int(args[args.index("--n") + 1]) if "--n" in args else 70
    if "--seeds" in args:
        seeds = [int(s) for s in args[args.index("--seeds") + 1].split(",")]
    else:
        seeds = [int(args[args.index("--seed") + 1]) if "--seed" in args else 13]
    out_name = args[args.index("--out") + 1] if "--out" in args else "FUZZ_STREAM.json"
    # --force-racy: every case drains through run_racy (kill-mid-batch
    # restart on a parquet sink) instead of a single memory-sink run —
    # the round-14 restart_racy family. two_phase is disabled (the two
    # restart modes are separate runners).
    force_racy = "--force-racy" in args
    # --provider hdfs: replay on the HDFS-backed state store (engine
    # default is RocksDB) — the provider-independence axis.
    provider = (
        args[args.index("--provider") + 1] if "--provider" in args else "rocksdb"
    )
    conf = {
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
    }
    if provider == "hdfs":
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        )
    elif provider != "rocksdb":
        raise SystemExit(f"--provider must be rocksdb or hdfs: {provider!r}")

    spark = get_spark(app_name="fuzz_stream", conf=conf)
    failures = []
    t0 = time.time()
    total = 0
    kills_total = 0
    b0_total = 0
    fam_counts: dict = {}
    for seed in seeds:
        for i in range(n):
            total += 1
            rng = random.Random(seed * 7_000_003 + i)
            spec = gen_case(rng)
            if force_racy:
                spec["racy"] = True
                spec["two_phase"] = False
            spec["__assign_seed"] = seed * 7_000_003 + i + 500_000
            fam_counts[spec["family"]] = fam_counts.get(spec["family"], 0) + 1
            try:
                fail = run_case(spec, spark)
            except Exception as exc:  # an engine error is a finding too
                fail = {
                    "error": repr(exc)[:500],
                    "spec": {
                        k: v for k, v in spec.items()
                        if k not in ("rows", "dups", "left", "right")
                    },
                }
            kills_total += spec.get("kills", 0)
            b0_total += spec.get("b0_rec", 0)
            if fail:
                failures.append({"seed": seed, "case": i, **fail})
                print(f"FAIL seed {seed} case {i}: {json.dumps(fail)[:400]}",
                      flush=True)
            if (i + 1) % 10 == 0:
                print(
                    f"  seed {seed}: {i + 1}/{n} cases, {len(failures)} failures,"
                    f" {time.time() - t0:.0f}s",
                    flush=True,
                )
    out = {
        "seeds": seeds, "cases": total, "families": fam_counts,
        "provider": provider,
        "restart": "racy" if force_racy else "two_phase_mix",
        "kills": kills_total,
        # kill-during-batch-0 checkpoints recovered via
        # streaming.recovery.clear_aborted_batch0 (round-14 finding #2)
        "batch0_recoveries": b0_total,
        "failures": failures, "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{total} cases, {len(failures)} failures ({out['elapsed_sec']}s)")
    print(json.dumps(fam_counts), flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
