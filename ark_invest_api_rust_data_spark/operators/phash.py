"""Perceptual image hashing (dHash) and Hamming-banded image
near-duplicate detection — the multimodal counterpart of MinHash-LSH
text dedup, and the standard first pass of image corpus dedup.

dHash (difference hash): decode → grayscale → resample to a
(gw+1)×gh grid → one bit per horizontal neighbor pair
(``1 if left < right``) → gw·gh bits.  Every step here is exact
integer math on top of the pure-Python codecs
(operators/multimodal.py): gray is the module's ``(r+g+b)//3``
convention, the resample is resize_nn's ``src = dst·src_dim//dst_dim``
index map, and the 64 bits pack MSB-first into four 16-bit bands —
so the whole hash is engine-reproducible and the probe hash-matches a
DuckDB oracle that recomputes the bits straight from the source
characters (same pin as llm_multimodal_pixels).

Near-dup shape (the scale path): exact Hamming distance is a
verify-only cost — candidates come from FOUR equi-joins on the 16-bit
bands (a pair within Hamming distance 3 of a 64-bit hash must agree
on at least one band — pigeonhole; more bands/passes widen the radius
guarantee, identical discipline to MinHash banding), then the XOR
popcount verifies candidates only.  No O(n²) stage anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

GRID_W, GRID_H = 8, 8  # 8×8 difference bits from a 9×8 gray grid


def dhash_bits_from_rgb(w: int, h: int, rgb: bytes) -> list[int]:
    """The 64 difference bits for a decoded top-down RGB stream —
    exact integer contract shared with the SQL oracle."""
    gw, gh = GRID_W + 1, GRID_H  # 9×8 gray grid
    gray = []
    for y in range(gh):
        sy = y * h // gh
        for x in range(gw):
            sx = x * w // gw
            p = (sy * w + sx) * 3
            gray.append((rgb[p] + rgb[p + 1] + rgb[p + 2]) // 3)
    bits = []
    for y in range(gh):
        for x in range(GRID_W):
            left = gray[y * gw + x]
            right = gray[y * gw + x + 1]
            bits.append(1 if left < right else 0)
    return bits


def bits_to_bands(bits: list[int]) -> tuple[int, int, int, int]:
    """Pack 64 bits MSB-first into four 16-bit bands."""
    out = []
    for i in range(4):
        v = 0
        for j in range(16):
            v = (v << 1) | bits[i * 16 + j]
        out.append(v)
    return tuple(out)  # type: ignore[return-value]


def dhash_bands(
    images: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    strict: bool | None = None,
) -> DataFrame:
    """Per-image dHash as four 16-bit bands (b0..b3).  Narrow
    mapInPandas over the binary column — zero shuffle; media
    partitions stay byte-bounded.  Undecodable payloads follow the
    module strict contract (raise by default)."""
    import pandas as pd

    from .multimodal import STRICT_DECODE, decode_image

    strict_eff = STRICT_DECODE if strict is None else strict
    schema = f"{id_col} long, b0 int, b1 int, b2 int, b3 int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[content_col]):
                decoded = decode_image(bytes(payload))
                if decoded is None:
                    if strict_eff:
                        raise ValueError(
                            f"dhash: undecodable image payload (id {did})"
                        )
                    continue
                w, h, rgb = decoded
                bands = bits_to_bands(dhash_bits_from_rgb(w, h, rgb))
                rows.append((int(did), *bands))
            yield pd.DataFrame(
                rows, columns=[id_col, "b0", "b1", "b2", "b3"]
            )

    return images.select(id_col, content_col).mapInPandas(fn, schema)


def dhash_near_dup_pairs(
    bands: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Image near-dup pairs via band-blocked candidates + exact
    Hamming verify.  Guarantee: any pair within Hamming distance 3
    shares ≥1 of the 4 bands (pigeonhole) and is always found;
    pairs between 4 and ``max_hamming`` are found iff their disagreeing
    bits cluster outside one band — the documented banding recall
    trade (same as MinHash-LSH).  Two shuffles on 16-bit band keys;
    the XOR popcount runs on candidates only."""
    a = bands.select(
        F.col(id_col).alias("id1"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    b = bands.select(
        F.col(id_col).alias("id2"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(4)],
    )
    cand = None
    for i in range(4):
        p = a.join(b, a[f"a{i}"] == b[f"c{i}"]).filter(
            F.col("id1") < F.col("id2")
        )
        cand = p if cand is None else cand.union(p)
    cand = cand.select(
        "id1", "id2",
        *[f"a{i}" for i in range(4)],
        *[f"c{i}" for i in range(4)],
    ).distinct()
    ham = sum(
        F.bit_count(F.expr(f"a{i} ^ c{i}").cast("long")) for i in range(4)
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
