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
