"""Multimodal column plumbing (SURVEY.md §2 B32 + driver north star).

Media (image/audio/video) travels as opaque ``binary`` columns with a
typed metadata struct. All the Spark-side machinery — schema, batch
iteration, Arrow transfer shape, partition sizing — is real and tested.
Image METADATA decode is real too: ``parse_image_dims`` reads
width/height straight from PNG IHDR / JPEG SOFn / GIF headers in pure
Python (no media libs needed). Only the pixel/feature codec is STUBBED
behind ``decode_stub``: a deterministic fake that derives feature
values from the bytes, or raises NotImplementedError in strict mode.

Pattern: ``mapInPandas`` over Arrow batches so each Python worker sees
a pandas iterator — the right shape for feeding a real decoder (PIL,
torchaudio, ffmpeg) batch-by-batch without materializing a partition.
At 100 TB: media rows are large, so partitions are kept small by bytes
(maxPartitionBytes), not rows, and the decode stage is a narrow map —
no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),  # parsed from real headers
        T.StructField("height", T.IntegerType()),  # (null if not an image)
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8
STRICT_DECODE = False  # flip to surface NotImplementedError instead of the fake


def attach_media(
    df: DataFrame, payload_col: str, kind: str, id_col: str | None = None
) -> DataFrame:
    """Wrap an arbitrary string/binary column as a media column with
    typed metadata (ingest-side adapter: real pipelines read with
    spark.read.format('binaryFile')). Pass ``id_col`` for a stable,
    partitioning-independent media_id (monotonically_increasing_id is
    the fallback and is NOT reproducible across runs)."""
    content = F.col(payload_col).cast("binary")
    media_id = F.col(id_col) if id_col else F.monotonically_increasing_id()
    return df.select(
        media_id.cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            F.length(content).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def ingest_binary_files(
    spark, path: str, kind: str, glob: str | None = None
) -> DataFrame:
    """The real 100 TB ingest path: ``spark.read.format('binaryFile')``
    over a directory of media files → MEDIA_SCHEMA. media_id is
    xxhash64 of the file path — stable across runs and partitionings
    (unlike monotonically_increasing_id). Parallelism comes from the
    file listing; each file is one row, and Spark sizes partitions by
    bytes, so giant media files don't skew tasks.

    ``glob`` narrows the listing (e.g. '*.png') via pathGlobFilter —
    pushed into the file index, never a post-scan filter."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),  # real dims come from
            F.lit(None).cast("int").alias("height"),  # extract_features
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """REAL image metadata decode, pure Python over raw bytes — no
    media libs needed. Supports PNG (IHDR), JPEG (SOFn segment walk)
    and GIF (logical screen descriptor); returns (width, height) or
    None if the payload is not a recognized image."""
    if b is None or len(b) < 10:
        return None
    # PNG: 8-byte signature, IHDR is always the first chunk → width and
    # height are the two big-endian u32 at offsets 16 and 20
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    # JPEG: walk marker segments to the first SOFn (C0–CF minus the
    # non-frame markers C4/C8/CC); dims are big-endian u16 at +5/+7
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:  # no payload
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    # GIF: little-endian u16 pair right after the 6-byte version tag
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    return None


def decode_stub(batch_rows, kind: str):
    """STUB decoder — deterministic fake features from raw bytes.

    Replace with a real codec (PIL/torchaudio/ffmpeg) per ``kind``; the
    signature (pandas Series of bytes → list of float vectors) is what
    a real implementation drops into."""
    if STRICT_DECODE:
        raise NotImplementedError(f"no codec for kind={kind} in this environment")
    out = []
    for payload in batch_rows:
        b = payload or b""
        acc = [0.0] * FEATURE_DIM
        for i, byte in enumerate(b):
            acc[i % FEATURE_DIM] += byte
        total = float(len(b)) or 1.0
        out.append([v / total for v in acc])
    return out


def extract_features(df: DataFrame) -> DataFrame:
    """The decode / feature-extract stage: mapInPandas over Arrow
    batches (narrow map, no shuffle); checksum is a plain sum of bytes
    so tests can cross-check against an expression-only computation."""

    def fn(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = decode_stub(pdf["content"], kind=str(pdf["kind"].iloc[0]) if len(pdf) else "")
            dims = [parse_image_dims(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b or b"") for b in pdf["content"]],
                    "checksum": [int(sum(b or b"")) for b in pdf["content"]],
                    "width": pd.array(
                        [d[0] if d else None for d in dims], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] if d else None for d in dims], dtype="Int32"
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage stub: updates metadata, passes content through
    (a real impl transforms bytes in the same mapInPandas shape)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stub for video rows: keeps metadata bookkeeping
    honest (n_frames shrinks) without a codec."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.greatest(
                (F.col("meta.n_frames") / F.lit(every_n)).cast("int"), F.lit(1)
            ).alias("n_frames"),
        ),
    )
