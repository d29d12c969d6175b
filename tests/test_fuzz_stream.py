"""Gate-sized slice of the streaming-twin differential fuzzer.

The full sweep (tools/fuzz_stream.py, 200+ cases per round) writes
FUZZ_STREAM.json; this keeps a fixed 8-case prefix of the same seed in
the pytest gate so a regression in any streaming twin (watermark dedup,
sessionize state machine, stream-stream interval join inner/leftOuter —
including NULL handling, watermark-boundary rows, and cross-batch
out-of-order merges) fails fast. 8 cases because each one runs a real
availableNow streaming query (~4-5 s); the 200-case campaign is the
round artifact, this is the regression tripwire.
"""

from __future__ import annotations

import random

import pytest

from tools.fuzz_stream import gen_case, run_case

SEED = 13
N = 8


@pytest.mark.parametrize("case", range(N))
def test_stream_fuzz_case(spark, case):
    rng = random.Random(SEED * 7_000_003 + case)
    spec = gen_case(rng)
    spec["__assign_seed"] = SEED * 7_000_003 + case + 500_000
    fail = run_case(spec, spark)
    assert fail is None, fail


@pytest.mark.parametrize("case", range(2))
def test_stream_fuzz_racy_restart(spark, case):
    """Round-14 restart_racy family tripwire: a kill-mid-batch restart
    on the same checkpoint + parquet sink must still hash-equal the
    batch twin (exactly-once via the sink's _spark_metadata commit log
    + checkpoint replay). Two cases — each runs 2-3 streaming starts."""
    rng = random.Random(SEED * 7_000_003 + 100 + case)
    spec = gen_case(rng)
    spec["racy"], spec["two_phase"] = True, False
    spec["__assign_seed"] = SEED * 7_000_003 + 100 + case + 500_000
    fail = run_case(spec, spark)
    assert fail is None, fail
    assert spec.get("kills", 0) >= 0  # kill count recorded by run_racy
