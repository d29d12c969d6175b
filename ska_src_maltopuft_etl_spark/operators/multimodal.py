"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``BinaryType`` columns moved in
Arrow batches through ``mapInPandas``; decode/feature-extraction runs
vectorized per batch. The actual media codecs are NOT available in this
environment (SURVEY/task contract), so ``decode`` ships a deterministic
fake: real Spark-side plumbing (schema, batching, partition preservation),
stubbed byte-level features. Swapping in PIL/librosa later only changes
``_fake_decode_batch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_FEATURE_FIELDS = [
    StructField("n_bytes", LongType()),
    StructField("first_byte", IntegerType()),
    StructField("tag", IntegerType()),
]


def real_media_decode(payload: bytes) -> dict:
    """Placeholder for a real codec (PIL.Image.open / soundfile / ffmpeg
    frame sampling). Not available in this container."""
    raise NotImplementedError(
        "media codecs are not installed; production deployments plug a "
        "real decoder into decode_binary_features(decoder=...)"
    )


def _fake_decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stub decode: byte length, first byte, small modular
    tag. Stands in for (width, height, channels)-style metadata."""
    n_bytes = payloads.map(len)
    first = payloads.map(lambda b: b[0] if len(b) else -1)
    tag = n_bytes % 251
    return pd.DataFrame(
        {"n_bytes": n_bytes.astype("int64"), "first_byte": first.astype("int32"),
         "tag": tag.astype("int32")}
    )


def decode_binary_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    batch_decoder=_fake_decode_batch,
) -> DataFrame:
    """Arrow-batched decode of a binary media column → typed features.

    ``mapInPandas`` keeps the operator embarrassingly parallel (no
    shuffle): each input partition streams through pandas batches. Output
    schema is (id, n_bytes, first_byte, tag).
    """
    id_field = df.schema[id_col]
    out_schema = StructType([id_field] + DECODED_FEATURE_FIELDS)
    narrow = df.select(id_col, binary_col)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = batch_decoder(pdf[binary_col])
            feats.insert(0, id_col, pdf[id_col].values)
            yield feats

    return narrow.mapInPandas(process, schema=out_schema)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Synthesize a binary payload column from text (test fixture for the
    decode path; real pipelines read binaryFile / parquet binary)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


# ---------------------------------------------------------------------------
# Resize / frame-sample / feature-extract (stub codecs, real plumbing)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
]


def resize_images(
    df: DataFrame, id_col: str, binary_col: str, width: int = 64, height: int = 64
) -> DataFrame:
    """Image resize over Arrow batches (stub: emits the target geometry
    and the RGB byte count a real resize would produce; a production
    deployment swaps the body for PIL/opencv). Map-only — no shuffle."""
    id_field = df.schema[id_col]
    out_schema = StructType([id_field] + RESIZED_SCHEMA_FIELDS)
    narrow = df.select(id_col, binary_col)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [width] * n,
                    "height": [height] * n,
                    "n_bytes": [width * height * 3] * n,
                }
            )

    return narrow.mapInPandas(process, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    frame_size: int = 256,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (one-to-many
    mapInPandas — the UDTF shape). The stub treats the payload as a
    concatenation of ``frame_size``-byte frames and emits every k-th
    frame's bytes; a real decoder would seek keyframes via ffmpeg."""
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            id_field,
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", LongType()),
            StructField("frame_head", IntegerType()),
        ]
    )
    narrow = df.select(id_col, binary_col)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, heads = [], [], [], []
            for rid, payload in zip(pdf[id_col].values, pdf[binary_col].values):
                n_frames = max(1, len(payload) // frame_size)
                step = max(1, n_frames // max_frames)
                for k, f in enumerate(range(0, n_frames, step)):
                    if k >= max_frames:
                        break
                    chunk = payload[f * frame_size : (f + 1) * frame_size]
                    ids.append(rid)
                    idxs.append(f)
                    sizes.append(len(chunk))
                    heads.append(chunk[0] if len(chunk) else -1)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": sizes,
                 "frame_head": heads}
            )

    return narrow.mapInPandas(process, schema=out_schema)


def extract_features(
    df: DataFrame, id_col: str, binary_col: str, dim: int = 16
) -> DataFrame:
    """Deterministic byte-level feature vector (``array<float>``): a
    dim-bucketed byte histogram, L1-normalized. Stub for a real vision/
    audio embedding model; the output feeds directly into
    operators/similarity.py (cosine_topk_*)."""
    from pyspark.sql.types import ArrayType, FloatType

    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field, StructField("features", ArrayType(FloatType()))]
    )
    narrow = df.select(id_col, binary_col)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[binary_col].values:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return narrow.mapInPandas(process, schema=out_schema)


def score_pairs_batched(
    pairs: DataFrame,
    query_col: str,
    text_col: str,
    id_cols: list[str],
    batch_scorer=None,
) -> DataFrame:
    """Model-inference plumbing for a cross-encoder rerank stage.

    Ships (query, document) candidate pairs through Arrow
    ``mapInPandas`` batches to a vectorized scorer — the exact batch
    shape a real cross-encoder ONNX/torch session consumes. The
    default scorer is a deterministic md5-derived stand-in
    (``int(md5(q + '|' + text)[:8], 16) / 4294967295``), which makes
    the WHOLE plumbing oracle-checkable: an independent SQL engine
    reproduces the scores bit-for-bit, certifying the Arrow path
    neither drops, duplicates, nor reorders pairs. Swap
    ``batch_scorer`` for a real model callable in production — the
    plan shape (map-only over candidate pairs, embarrassingly
    parallel) is unchanged.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if batch_scorer is None:

        def batch_scorer(q: "pd.Series", t: "pd.Series") -> "pd.Series":
            import hashlib

            return pd.Series(
                [
                    int(
                        hashlib.md5(f"{a}|{b}".encode()).hexdigest()[:8], 16
                    )
                    / 4294967295.0
                    for a, b in zip(q, t)
                ],
                index=q.index,
                dtype="float64",
            )

    narrow = pairs.select(*id_cols, query_col, text_col)
    out_schema = StructType(
        [narrow.schema[c] for c in id_cols] + [StructField("ce_score", DoubleType())]
    )

    def process(batches):
        for pdf in batches:
            out = pdf[id_cols].copy()
            out["ce_score"] = batch_scorer(pdf[query_col], pdf[text_col])
            yield out

    return narrow.mapInPandas(process, schema=out_schema)
