"""Multimodal column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payloads (the reference's BLOB,
``types.rs:104-108``) plus a typed metadata struct. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signature, partition
discipline — is real and tested; the actual media decode is STUBBED
(`decode_payload` with a deterministic fake) because codec libraries are
not in this environment. Swap `_fake_decode` for a real decoder (PIL,
torchaudio, ...) without touching any Spark plumbing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def with_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a binary payload column + typed metadata. Here the payload
    is the UTF-8 encoding of the text (a deterministic stand-in for image
    bytes); real pipelines read with spark.read.format('binaryFile')."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("payload_len"),
    )


def _fake_decode(payload: bytes) -> tuple[float, int]:
    """Deterministic stand-in for a media decoder: 'features' are the mean
    byte value and the byte count. Raises like a real decoder on None.

    Replace with e.g. PIL.Image.open(io.BytesIO(payload)) — the Spark
    plumbing (Arrow batching, schema, partitioning) stays identical.
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder would fail here")
    if len(payload) == 0:
        return 0.0, 0
    return sum(payload) / len(payload), len(payload)


def decode_features(payloads: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Feature-extract payloads via mapInPandas (Arrow-batched; one python
    worker per partition — partition count controls decode parallelism)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": pdf["payload_len"],
                    "feat_mean": [f[0] for f in feats],
                    "feat_dim": [f[1] for f in feats],
                }
            )

    return payloads.mapInPandas(decode_batches, FEATURE_SCHEMA)
