"""Multimodal column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payloads (the reference's BLOB,
``types.rs:104-108``) plus a typed metadata struct. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signature, partition
discipline — is real and tested.

Decode status: BMP and PPM (P6/P3) are decoded for REAL — pure-Python
header parse in ``parse_image_meta`` (no codec libs needed), with
matching writers (``encode_bmp``/``encode_ppm``) for round-trip tests
and synthetic corpora. Codec formats that need external libs (JPEG/PNG/
video) remain STUBBED via ``_fake_decode``; swap in PIL/torchaudio/...
without touching any Spark plumbing.
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


# --- real image codecs (BMP / PPM, pure Python) ---------------------------

def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal 24bpp BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row
    padding) with deterministic pixel bytes — a real, spec-conforming file
    any image viewer opens."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    total = 54 + img_size
    header = (
        b"BM"
        + total.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (seed + 31 * x + 17 * y) % 256
            row += bytes((v, (v * 7) % 256, (v * 13) % 256))  # B, G, R
        rows.append(bytes(row) + b"\x00" * pad)
    return header + b"".join(rows)


def encode_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal binary PPM (P6, maxval 255) with deterministic pixels."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    px = bytearray()
    for y in range(height):
        for x in range(width):
            v = (seed + 31 * x + 17 * y) % 256
            px += bytes((v, (v * 7) % 256, (v * 13) % 256))
    return header + bytes(px)


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Real, spec-conforming 8-bit RGB PNG (IHDR + zlib IDAT + IEND,
    CRC-checked chunks, filter-type-0 scanlines) with deterministic
    pixels — pure stdlib (zlib/struct/binascii), no codec libs."""
    import binascii
    import struct
    import zlib

    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw += b"\x00"  # filter: None
        for x in range(width):
            v = (seed + 31 * x + 17 * y) % 256
            raw += bytes((v, (v * 7) % 256, (v * 13) % 256))
    idat = zlib.compress(bytes(raw), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def encode_jpeg_header(width: int, height: int, seed: int = 0) -> bytes:
    """Structurally valid JFIF marker stream: SOI, APP0, SOF0 (baseline,
    8-bit, 3 components) carrying the real dimensions, SOS, deterministic
    filler entropy bytes, EOI. NOT a decodable image (no DQT/DHT/real
    entropy coding — writing a true JPEG needs DCT+Huffman, i.e. a codec
    lib); every header scanner, including ``parse_image_meta``, reads
    dimensions from it exactly as from a camera JPEG."""
    import struct

    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * 3)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    sos = b"\xff\xda" + struct.pack(">H", 6 + 2 * 3) + b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    entropy = bytes((seed + 7 * i) % 255 for i in range(32))  # never 0xFF
    return soi + app0 + sof0 + sos + entropy + b"\xff\xd9"


def _parse_png_meta(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """IHDR parse: width/height big-endian at offsets 16/20; bpp =
    bit_depth x channels(color_type)."""
    if len(payload) < 29:
        return "unknown", None, None, None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    bit_depth = payload[24]
    color_type = payload[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        return "png", width, height, None
    return "png", width, height, bit_depth * channels


def _parse_jpeg_meta(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Marker scan to the first SOF0/1/2/3 frame header (the rule every
    image tool uses): skip variable-length segments via their big-endian
    lengths; dimensions live at +5 (height) / +7 (width) past the marker,
    bpp = precision x component count."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return "unknown", None, None, None
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
            break
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            if i + 4 + 5 > n:
                break
            precision = payload[i + 4]
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            ncomp = payload[i + 9]
            return "jpeg", width, height, precision * ncomp
        i += 2 + seg_len
    return "jpeg", None, None, None


def parse_image_meta(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Real header parse: (format, width, height, bits_per_pixel).

    BMP: magic 'BM', little-endian int32 dims at offsets 18/22 (negative
    height = top-down storage — reported as |height|), bpp at 28.
    PPM: 'P6'/'P3' ASCII header with '#' comments.
    PNG: magic + IHDR (big-endian dims, bit-depth x channels).
    JPEG: magic FFD8 + marker scan to SOF0/1/2/3.
    Anything else → ('unknown', None, None, None); a real codec lib
    slots in there.
    """
    if payload is None:
        raise ValueError("null payload")
    if len(payload) >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _parse_png_meta(payload)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        return _parse_jpeg_meta(payload)
    if len(payload) >= 54 and payload[:2] == b"BM":
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        return "bmp", width, abs(height), bpp
    if len(payload) >= 2 and payload[:2] in (b"P6", b"P3"):
        fmt = payload[:2].decode("ascii")
        tokens: list[int] = []
        i = 2
        while i < len(payload) and len(tokens) < 3:
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                tokens.append(int(payload[i:j]))
                i = j
        if len(tokens) < 3:
            return "unknown", None, None, None
        width, height, maxval = tokens
        return ("ppm" if fmt == "P6" else "ppm_ascii"), width, height, (
            24 if maxval < 256 else 48
        )
    return "unknown", None, None, None


def with_image_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL image payload per row (BMP for even ids, PPM for
    odd), dimensions derived deterministically from the id — so an oracle
    can independently derive the expected metadata and any writer/parser
    bug shows up as a differential mismatch. Runs in mapInPandas (encode
    is per-row Python, the exact shape a real ingest decoder uses)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes, lens = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                if did % 2 == 0:
                    p = encode_bmp(w, h, seed=did % 251)
                    mtypes.append("image/bmp")
                else:
                    p = encode_ppm(w, h, seed=did % 251)
                    mtypes.append("image/x-portable-pixmap")
                payloads.append(p)
                lens.append(len(p))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": mtypes,
                    "payload_len": lens,
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, PAYLOAD_SCHEMA
    )


def with_multiformat_image_payload(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a payload per row across all four supported container
    formats — doc_id % 4: BMP, PPM, PNG, JPEG — dims derived from the id
    (same formula as ``with_image_payload``) so an oracle derives the
    expected metadata independently of the writer AND the parser."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes, lens = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                fmt = did % 4
                if fmt == 0:
                    p, m = encode_bmp(w, h, seed=did % 251), "image/bmp"
                elif fmt == 1:
                    p, m = encode_ppm(w, h, seed=did % 251), "image/x-portable-pixmap"
                elif fmt == 2:
                    p, m = encode_png(w, h, seed=did % 251), "image/png"
                else:
                    p, m = encode_jpeg_header(w, h, seed=did % 251), "image/jpeg"
                payloads.append(p)
                mtypes.append(m)
                lens.append(len(p))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": mtypes,
                    "payload_len": lens,
                }
            )

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, PAYLOAD_SCHEMA
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("img_format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bpp", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
        T.StructField("payload_len", T.LongType()),
    ]
)


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """Real image decode over mapInPandas: width/height/bpp/aspect parsed
    from actual BMP/PPM bytes (not metadata columns). Shuffle-free; decode
    parallelism = partition count, same plumbing as the stubbed paths."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "img_format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "bpp": [m[3] for m in metas],
                    "aspect": [
                        round(m[1] / m[2], 6) if m[1] and m[2] else None
                        for m in metas
                    ],
                    "payload_len": pdf["payload_len"],
                }
            )

    return payloads.mapInPandas(do, IMAGE_META_SCHEMA)


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
