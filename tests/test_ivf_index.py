"""Persistent IVF ANN index (operators/ivf_index.py).

Property under test (the round-14 VERDICT item #5 contract): a freshly
built index answers `query` BIT-IDENTICALLY to the one-shot
`similarity.cosine_topk_ivf` with the same parameters — both run the
same deterministic training, assignment, and declarative top-k. Plus
the incremental contracts: `update` is idempotent (re-running a batch
is a no-op), updated vectors become searchable, and `staleness` tracks
the post-build fraction.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ska_src_maltopuft_etl_spark.operators import similarity
from ska_src_maltopuft_etl_spark.operators.ivf_index import IvfIndex
from ska_src_maltopuft_etl_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture()
def index_path():
    d = tempfile.mkdtemp(prefix="ivf_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_query_matches_one_shot_ivf(spark, emb, index_path):
    """Built index == one-shot cosine_topk_ivf, value-exact."""
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    idx = IvfIndex(spark, index_path, n_centroids=8)
    n = idx.build(c)
    assert n == c.count()
    got = idx.query(q, k=5, n_probe=4)
    want = similarity.cosine_topk_ivf(
        q, c, "vec_id", "embedding", k=5, n_centroids=8, n_probe=4
    )
    assert _rows(got) == _rows(want)


def test_update_idempotent_and_searchable(spark, emb, index_path):
    base = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 40))
    batch = emb.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 50))
    idx = IvfIndex(spark, index_path, n_centroids=4)
    idx.build(base)
    assert idx.staleness() == 0.0
    n1 = idx.update(batch)
    assert n1 == batch.count()
    # re-running the same batch is a no-op (anti-join on vec_id)
    assert idx.update(batch) == 0
    assert idx.staleness() == pytest.approx(n1 / (30 + n1))
    # an updated vector queried against the index must return itself
    # as its own top neighbor (cosine 1.0)
    probe = batch.limit(1)
    top = idx.query(probe, k=1, n_probe=4).collect()
    assert len(top) == 1
    assert top[0]["neighbor_id"] == probe.head()["vec_id"]
    assert top[0]["cosine"] == pytest.approx(1.0)


def test_recall_parity_after_rebuild(spark, emb, index_path):
    """build → update → rebuild gives the same answers as building on
    the full corpus directly (rebuild erases staleness)."""
    full = emb.where(F.col("vec_id") >= 10)
    part = full.where(F.col("vec_id") < 60)
    rest = full.where(F.col("vec_id") >= 60)
    q = emb.where(F.col("vec_id") < 5)

    idx = IvfIndex(spark, index_path, n_centroids=8)
    idx.build(part)
    idx.update(rest)
    idx.build(full)  # rebuild over everything
    assert idx.staleness() == 0.0
    got = idx.query(q, k=5, n_probe=4)
    want = similarity.cosine_topk_ivf(
        q, full, "vec_id", "embedding", k=5, n_centroids=8, n_probe=4
    )
    assert _rows(got) == _rows(want)


def test_needs_rebuild_policy(spark, emb, index_path):
    base = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    grow = emb.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 45))
    idx = IvfIndex(spark, index_path, n_centroids=2)
    idx.build(base)
    assert not idx.needs_rebuild(max_stale=0.5)
    idx.update(grow)  # 25 new on 10 built -> staleness 25/35 > 0.5
    assert idx.needs_rebuild(max_stale=0.5)
