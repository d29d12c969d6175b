"""Structured Streaming tests: file-arrival ingest with watermark dedup,
driven with availableNow triggers over static fixture directories."""

from __future__ import annotations

import json
import time

from ska_src_maltopuft_etl_spark.streaming import stream_run_summaries


def test_stream_run_summaries_dedup(spark, tmp_path):
    from tests.test_meertrap_pipeline import OBS, run_summary

    data = tmp_path / "stream_data"
    # two dirs share an identical summary (dup), one differs
    for i, host in enumerate(["tpn-0-37", "tpn-0-37", "tpn-0-38"]):
        d = data / f"{host}_{1700000000 + i}"
        d.mkdir(parents=True)
        sb, start, stop = OBS[0] if host == "tpn-0-37" else OBS[1]
        (d / f"t0_{host}_run_summary.json").write_text(
            json.dumps(run_summary(sb, start, stop, host))
        )

    stream = stream_run_summaries(spark, str(data))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("rs_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rs_stream").collect()
    # 3 files, 2 identical → 2 survivors
    assert len(rows) == 2
    assert {r["meerkat_id"] for r in rows} == {79119}


def test_sessionize_events_stateful(spark, tmp_path):
    import json as _json

    from ska_src_maltopuft_etl_spark.streaming import sessionize_events

    data = tmp_path / "events_stream"
    data.mkdir()
    # batch 1: two events 1 min apart; batch 2 (separate file): an event
    # 2 h later → the first session closes and is emitted.
    (data / "a.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:00.000Z", "value": 1.5},
                {"user_id": 1, "ts": "2024-01-01T00:01:00.000Z", "value": 2.5},
            ]
        )
    )
    (data / "b.json").write_text(
        _json.dumps({"user_id": 1, "ts": "2024-01-01T02:00:00.000Z", "value": 9.0})
    )

    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(data))
    )
    sessions = sessionize_events(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) == 1
    s = rows[0]
    assert s["n_events"] == 2
    assert s["total_value"] == 4.0
    assert (s["session_end"] - s["session_start"]).total_seconds() == 60.0
