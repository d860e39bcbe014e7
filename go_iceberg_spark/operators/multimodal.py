"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched Pandas functions over
``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) — but the
Spark-side plumbing is real and tested: schema conventions, Arrow batch
transfer of binary columns, batch-shaped UDF signatures, and partition-size
control for memory-bounded media batches.

Scale notes (100 TB of media): binary payloads dominate partition size, so
``media_repartition`` sizes partitions by BYTES (payload sum), not row count;
decode stages use ``mapInPandas`` so one task streams batches instead of
materializing a partition of blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema convention for a multimodal asset column group
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def attach_media(df: DataFrame, text_to_bytes_col: str, media_type: str = "image", fmt: str = "raw") -> DataFrame:
    """Test helper: materialize an opaque binary payload column + metadata
    struct from an existing column (deterministic; no codecs involved)."""
    return df.withColumn("media_bytes", F.encode(F.col(text_to_bytes_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic fake 'decoded' feature vector: bytes of sha256 digest
    scaled to [0,1). Stands in for a real decode→embed pipeline; REPLACE with
    a codec-backed implementation where libraries are available."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, id_col: str, bytes_col: str = "media_bytes") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Output: (id, n_bytes, sha256, features array<double>). The decode is the
    deterministic stub above; the Arrow batch path, schema, and memory shape
    are production-real."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("sha256", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bytes_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "features": payloads.map(lambda b: _fake_decode_features(bytes(b))),
                }
            )

    # NULL payloads (fetch failures are routine in media tables) have no
    # features — drop them BEFORE the Arrow batch instead of len(None)-ing
    # inside it (r6 probe)
    return (df.select(id_col, bytes_col)
            .filter(F.col(bytes_col).isNotNull())
            .mapInPandas(process, out_schema))


def parse_image_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL (format, width, height) from container header bytes — stdlib
    ``struct`` only, no codec (r11, VERDICT task #5): PNG IHDR, JPEG SOFn
    segment walk, GIF logical-screen descriptor, BMP info header. Returns
    (None, None, None) for unrecognized/truncated payloads — metadata
    extraction over a 100 TB media crawl must tolerate garbage rows, not
    throw. Pixel decode stays honestly NotImplemented (``decode_image``)."""
    import struct as _s

    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = _s.unpack(">II", b[16:24])
        return "png", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn (C0-CF minus the
        # non-frame C4/C8/CC); dimensions live 5 bytes into its payload
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _s.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = _s.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seg_len
        return "jpeg", None, None  # JPEG magic but no parseable frame
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _s.unpack("<HH", b[6:10])
        return "gif", w, h
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = _s.unpack("<ii", b[18:26])
        return "bmp", w, abs(h)  # negative height = top-down DIB
    return None, None, None


def decode_image_metadata(df: DataFrame, id_col: str, bytes_col: str = "media_bytes") -> DataFrame:
    """mapInPandas header-metadata decode: (id, media_meta) where
    ``media_meta`` is the MEDIA_META_SCHEMA struct with REAL format/width/
    height parsed from PNG/JPEG/GIF/BMP header bytes (``parse_image_header``
    — stdlib struct, no codecs). Arrow-batched; NULL payloads dropped
    before the batch (fetch failures are routine in media tables)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media_meta", MEDIA_META_SCHEMA, False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[bytes_col]:
                fmt, w, h = parse_image_header(bytes(payload))
                metas.append({"media_type": "image", "format": fmt,
                              "width": w, "height": h, "duration_ms": None})
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                "media_meta": metas})

    return (df.select(id_col, bytes_col)
            .filter(F.col(bytes_col).isNotNull())
            .mapInPandas(process, out_schema))


def synth_image_bytes(kind: str, width: int, height: int) -> bytes:
    """Fixture builder: REAL container header bytes (valid PNG signature +
    IHDR / JPEG APP0 + SOF0 walk / GIF89a screen descriptor) carrying the
    given dimensions, with no pixel data — what a header-only metadata
    parser sees of a real file. Deterministic, stdlib-only."""
    import struct as _s

    if kind == "png":
        ihdr = _s.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
        return (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + ihdr
                + b"\x00\x00\x00\x00")  # CRC placeholder — parser ignores it
    if kind == "jpeg":
        app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        sof0 = (b"\xff\xc0" + _s.pack(">H", 17) + b"\x08"
                + _s.pack(">HH", height, width)
                + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
        return b"\xff\xd8" + app0 + sof0
    if kind == "gif":
        return b"GIF89a" + _s.pack("<HH", width, height) + b"\xf7\x00\x00"
    raise ValueError(f"unknown fixture kind {kind!r}")


def attach_synthetic_images(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture: derive a real-headered image payload per row from the id —
    format cycles png/jpeg/gif by id%3, dimensions are id arithmetic
    (1 + id*37 % 4096 wide, 1 + id*59 % 4096 tall), and every id%13==0 row
    is GARBAGE bytes (no recognizable container) so parsers' tolerance
    paths stay exercised. Built inside mapInPandas: at scale the payloads
    are generated executor-side, never on the driver."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media_bytes", T.BinaryType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                d = int(rid)
                if d % 13 == 0:
                    payloads.append(b"\x00garbage-not-an-image\x00" + bytes([d % 251]))
                else:
                    kind = ("png", "jpeg", "gif")[d % 3]
                    payloads.append(synth_image_bytes(
                        kind, 1 + (d * 37) % 4096, 1 + (d * 59) % 4096))
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                "media_bytes": payloads})

    return df.select(id_col).mapInPandas(process, out_schema)


def decode_image(df: DataFrame, id_col: str, bytes_col: str = "media_bytes"):
    """PIXEL decode — requires PIL/opencv, absent in this container. Header
    metadata (format/width/height) needs no codec: use
    ``decode_image_metadata``; deterministic fake features: ``extract_features``."""
    raise NotImplementedError(
        "image pixel codecs unavailable in this environment; "
        "decode_image_metadata() extracts real header metadata and "
        "extract_features() provides the deterministic stub pipeline"
    )


def resize_images(
    df: DataFrame, id_col: str, bytes_col: str = "media_bytes", *, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize over mapInPandas. The pixel resample is a deterministic
    stub (codecs absent here): output payload is a truncated/cycled byte
    buffer of exactly width*height*3 bytes, so downstream batch shapes,
    memory budgeting, and schema are production-real. Swap `_stub_resize`
    for a PIL/cv2 call where codecs exist."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("media_bytes", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    target = width * height * 3

    def _stub_resize(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        reps = target // len(payload) + 1
        return (payload * reps)[:target]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "media_bytes": pdf[bytes_col].map(lambda b: _stub_resize(bytes(b))),
                    "width": width,
                    "height": height,
                }
            )

    return (df.select(id_col, bytes_col)
            .filter(F.col(bytes_col).isNotNull())  # see extract_features
            .mapInPandas(process, out_schema))


def sample_frames(
    df: DataFrame, id_col: str, bytes_col: str = "media_bytes", *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling over mapInPandas: one output row per sampled
    frame (id, frame_idx, frame_bytes, offset). The 'frame' extraction is a
    deterministic stub (fixed-stride byte slices standing in for keyframe
    decode); the fan-out shape — one input row to max_frames output rows,
    exploded inside the Arrow batch — is the production pattern for
    ffmpeg-backed sampling."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
            T.StructField("byte_offset", T.LongType(), False),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, offs = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(payload)
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    ids.append(int(rid))
                    idxs.append(i)
                    frames.append(b[off : off + every_n_bytes])
                    offs.append(off)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_bytes": frames, "byte_offset": pd.Series(offs, dtype="int64")}
            )

    return (df.select(id_col, bytes_col)
            .filter(F.col(bytes_col).isNotNull())  # see extract_features
            .mapInPandas(process, out_schema))


def media_repartition(df: DataFrame, bytes_col: str, target_partition_bytes: int = 256 * 1024 * 1024) -> DataFrame:
    """Repartition media rows so each task holds ~target bytes of payload —
    sampling-based estimate of mean payload size; prevents OOM on skewed
    blob sizes at scale."""
    row = df.select(F.avg(F.length(F.col(bytes_col))).alias("avg"), F.count(F.lit(1)).alias("n")).collect()[0]
    if not row["n"]:
        return df
    total = (row["avg"] or 1) * row["n"]
    parts = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(parts)
