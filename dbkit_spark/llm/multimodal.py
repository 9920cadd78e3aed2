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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("target_bytes", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def _fake_resize(payload: bytes, target: int) -> bytes:
    """Deterministic stand-in for an image resize: truncate or zero-pad to
    ``target`` bytes. Replace with PIL thumbnail + re-encode; the Spark
    plumbing (schema, Arrow batches, partitioning) stays identical."""
    if payload is None:
        raise NotImplementedError("no payload; real resizer would fail here")
    return payload[:target].ljust(target, b"\0")


def resize_payloads(payloads: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Media resize over mapInPandas (decode stubbed, plumbing real)."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_fake_resize(p, target_bytes) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "payload_len": [len(p) for p in out],
                    "target_bytes": target_bytes,
                }
            )

    return payloads.mapInPandas(do, RESIZED_SCHEMA)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one media payload row fans out to ``n_frames`` frame
    rows (the video analogue of explode). Fake frames are contiguous byte
    slices; a real impl swaps in a video decoder per Arrow batch. Output
    partitioning follows the input — no shuffle for the fan-out."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    raise NotImplementedError("real frame sampler would fail here")
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = bytes(payload[i * step : i * step + step])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(frame)
                    rows["frame_len"].append(len(frame))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(do, FRAME_SCHEMA)


def decode_features_arrow(payloads: DataFrame) -> DataFrame:
    """mapInArrow variant of ``decode_features`` (§2.10): the python worker
    sees raw ``pyarrow.RecordBatch``es — no pandas conversion cost. Must
    produce byte-identical results to the pandas path (tested)."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("media_type", pa.string()),
            ("payload_len", pa.int64()),
            ("feat_mean", pa.float64()),
            ("feat_dim", pa.int32()),
        ]
    )

    def do(batches):
        for batch in batches:
            d = batch.to_pydict()
            feats = [_fake_decode(p) for p in d["payload"]]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": d["doc_id"],
                    "media_type": d["media_type"],
                    "payload_len": d["payload_len"],
                    "feat_mean": [f[0] for f in feats],
                    "feat_dim": [f[1] for f in feats],
                },
                schema=out_schema,
            )

    return payloads.mapInArrow(do, FEATURE_SCHEMA)
