"""Gate-sized slice of the differential query fuzzer.

The full sweep (tools/fuzz_differential.py, 300+ cases at sf0.01) runs
per-round and writes FUZZ.json; this keeps a fixed 30-case prefix of
the same seed in the pytest gate so a regression in any rendering
path (predicate, projection, join, aggregate, order/limit) fails
fast at sf0.001.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from tools.fuzz_differential import TABLES, gen_spec, run_case, table_stats

SF = "/root/testdata/sf0.001"
SEED = 11
N = 30


@pytest.fixture(scope="module")
def fuzz_env(spark):
    from ska_src_maltopuft_etl_spark.sources import load_tables

    tables = load_tables(spark, SF)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return tables, con, table_stats(con, SF)


@pytest.mark.parametrize("case", range(N))
def test_fuzz_case(fuzz_env, case):
    tables, con, stats = fuzz_env
    rng = random.Random(SEED * 1_000_003 + case)
    spec = gen_spec(rng, stats)
    fail = run_case(spec, tables, con)
    assert fail is None, fail
