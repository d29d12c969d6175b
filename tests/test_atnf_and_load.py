"""ATNF pipeline + idempotent load-layer tests."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.plans.atnf import atnf_run
from ska_src_maltopuft_etl_spark.sinks import (
    TargetInformation,
    load_targets,
    prepare_data_for_insert,
)


def fake_atnf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "NAME": ["J0437-4715", "J0534+2200"],
            "RAJ": ["04:37:15.99", "05:34:31.97"],
            "DECJ": ["-47:15:09.7", "+22:00:52.1"],
            "DM": [2.64, 56.77],
            "W50": [0.141, 3.0],
            "P0": [0.005757, 0.033392],
            "DM_ERR": [0.01, 0.1],  # must be dropped
        }
    )


def test_atnf_pipeline(spark):
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    tables = atnf_run(spark, fake_atnf, visited_at=ts)
    cat = tables["catalogue"].collect()
    assert len(cat) == 1 and cat[0]["name"] == "ATNF pulsar catalogue"
    visit = tables["catalogue_visit"].collect()
    assert len(visit) == 1 and visit[0]["catalogue_id"] == 1
    ps = sorted(tables["known_pulsar"].collect(), key=lambda r: r["id"])
    assert [p["id"] for p in ps] == [1, 2]
    # J0437-4715: ra = (4 + 37/60 + 15.99/3600)*15 = 69.31663 (5dp)
    assert ps[0]["ra"] == pytest.approx(69.31663, abs=1e-5)
    assert ps[0]["dec"] == pytest.approx(-47.25269, abs=1e-5)
    assert ps[0]["pos"] == "(69.31663,-47.25269)"
    assert "dm" in tables["known_pulsar"].columns


def test_prepare_data_for_insert(spark):
    wide = spark.createDataFrame(
        [(1, 10, "x", 5.0), (2, 20, "y", 6.0), (2, 20, "y", 6.0)],
        "obs_id int, schedule_block_id int, obs_name string, other double",
    )
    t = TargetInformation("observation", "obs_", "obs_id", ("schedule_block_id",))
    out = prepare_data_for_insert(wide, t)
    assert sorted(out.columns) == ["id", "name", "schedule_block_id"]
    assert out.count() == 2


def test_load_targets_idempotent(spark, tmp_path):
    out = str(tmp_path / "db")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    targets = (TargetInformation("t1", "", "id", (), ("name",)),)
    load_targets(spark, {"t1": df}, targets, output_dir=out)
    # same rows again → no duplicates (merge semantics)
    load_targets(spark, {"t1": df}, targets, output_dir=out)
    # one new row → appended once
    df2 = spark.createDataFrame([(1, "a"), (3, "c")], "id int, name string")
    load_targets(spark, {"t1": df2}, targets, output_dir=out)
    final = spark.read.parquet(f"{out}/t1.parquet")
    assert sorted(r["name"] for r in final.collect()) == ["a", "b", "c"]
