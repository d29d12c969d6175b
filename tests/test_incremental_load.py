"""Incremental-load reconciliation test (K4 + J9): two overlapping
pipeline batches land in one parquet 'database'; ids are reconciled on
natural keys and downstream FKs are remapped through the keymaps."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.plans.meertrap import meertrap_run
from ska_src_maltopuft_etl_spark.sinks import MEERTRAP_TARGETS, incremental_load

from tests.test_meertrap_pipeline import HOST_BEAMS, OBS, mjd, run_summary, spccl_line


def _write_batch(root, obs_list, start_offset):
    n = start_offset
    for sb, start, stop in obs_list:
        for host in HOST_BEAMS:
            d = root / f"{host}_{1700000000 + n}"
            d.mkdir(parents=True)
            n += 1
            (d / f"t0_{host}_run_summary.json").write_text(
                json.dumps(run_summary(sb, start, stop, host))
            )
            b = HOST_BEAMS[host][0]
            t1 = start + dt.timedelta(seconds=30)
            (d / "candA_beam.spccl.log").write_text(
                spccl_line(mjd(t1), 123.45, 4.2, 9.7, b["absnum"], "C",
                           b["ra_hms"], b["dec_dms"])
            )
    return n


def test_incremental_load_reconciles_ids_and_fks(spark, tmp_path):
    out = str(tmp_path / "warehouse")
    batch1 = tmp_path / "p1"
    batch2 = tmp_path / "p2"
    # batch 1: SB1 observations only; batch 2 overlaps (all three obs,
    # including SB1's two plus SB2's one)
    _write_batch(batch1, OBS[:2], 0)
    _write_batch(batch2, OBS, 100)

    t1 = meertrap_run(spark, str(batch1), partition_key="p1")
    loaded1 = incremental_load(spark, t1, MEERTRAP_TARGETS, out)
    sb1 = {(r["id"],) for r in loaded1["schedule_block"].collect()}
    assert len(sb1) == 1
    n_obs_1 = loaded1["observation"].count()
    assert n_obs_1 == 2

    t2 = meertrap_run(spark, str(batch2), partition_key="p2")
    loaded2 = incremental_load(spark, t2, MEERTRAP_TARGETS, out)
    sbs = sorted(r["id"] for r in loaded2["schedule_block"].collect())
    assert sbs == [1, 2]  # SB1 kept its id, SB2 appended
    obs = loaded2["observation"].collect()
    assert len(obs) == 3
    by_tmin = {r["t_min"]: r for r in obs}
    # SB2's observation points at the APPENDED schedule block id (2),
    # not its batch-local id (which was also 2 in batch2 but for a
    # different ordering — the natural-key match guarantees consistency)
    sb_rows = {r["id"]: r for r in loaded2["schedule_block"].collect()}
    for r in obs:
        assert r["schedule_block_id"] in sb_rows
        sb = sb_rows[r["schedule_block_id"]]
        assert sb["start_at"] <= r["t_min"]

    # hosts deduped across batches on (ip, hostname, port)
    assert loaded2["host"].count() == 2
    # beams: batch1 contributed 2 obs × 5 beams, batch2 adds SB2's obs
    assert loaded2["beam"].count() == 15
    # every candidate's beam_id resolves in the final beam table
    beams = {r["id"] for r in loaded2["beam"].collect()}
    cands = loaded2["candidate"].collect()
    assert all(c["beam_id"] in beams for c in cands)
    # re-running batch2 is a no-op (idempotency)
    loaded3 = incremental_load(spark, meertrap_run(spark, str(batch2), partition_key="p2"),
                               MEERTRAP_TARGETS, out)
    for name in ("schedule_block", "observation", "beam", "candidate", "sp_candidate"):
        assert loaded3[name].count() == loaded2[name].count(), name


def test_incremental_load_matches_on_every_unique_set(spark, tmp_path):
    """Round-6 ADVICE: a table with extra_unique_keys must get the same
    conflict semantics on the incremental path as in the merge sinks —
    a row matching an existing row on ANY unique set adopts the
    existing id instead of re-appending."""
    from ska_src_maltopuft_etl_spark.sinks import TargetInformation

    out = str(tmp_path / "wh")
    target = TargetInformation(
        "account", "", "id",
        unique_key=("email",),
        extra_unique_keys=(("username",),),
    )
    b1 = spark.createDataFrame(
        [(1, "a@x.io", "alice"), (2, "b@x.io", "bob")],
        "id long, email string, username string",
    )
    loaded = incremental_load(spark, {"account": b1}, [target], out)
    assert loaded["account"].count() == 2

    b2 = spark.createDataFrame(
        [
            (1, "a@x.io", "alice2"),      # matches set 1 (email)
            (2, "bob@new.io", "bob"),     # matches ONLY set 2 (username)
            (3, "c@x.io", "carol"),       # novel
        ],
        "id long, email string, username string",
    )
    loaded = incremental_load(spark, {"account": b2}, [target], out)
    rows = {r["username"]: r["id"] for r in loaded["account"].collect()}
    # bob matched on username alone -> adopted id 2, no duplicate row;
    # carol appended above the existing max id.
    assert loaded["account"].count() == 3
    assert rows == {"alice": 1, "bob": 2, "carol": 3}
