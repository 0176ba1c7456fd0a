"""Image-dedup probes (B29×B32 composition): perceptual dHash and
Hamming-banded image near-dup pairs (operators/phash.py).

Oracle discipline: each document's first 72 chars become a 6×4 24-bit
BMP (same character-derived construction as llm_multimodal_pixels);
the Spark side runs the REAL codec chain (encode → decode → gray →
nearest-neighbor grid → difference bits → bands) while the oracle
recomputes every bit straight from the characters with the identical
integer index math — a decoder, resampler, or bit-packing bug
hash-mismatches."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.phash import dhash_bands, dhash_near_dup_pairs
from .base import Probe

PROBES: list[Probe] = []

_SRC_W, _SRC_H = 6, 4  # chars 1..72 → 6×4 RGB image
_GW, _GH = 8, 8  # 8×8 difference bits over a 9×8 gray grid
_MAX_HAMMING = 6


def _doc_images(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, content): a real BMP per document, derived from its
    first 72 characters (ord%256, row-major top-down RGB)."""
    import pandas as pd

    from ..operators.multimodal import encode_bmp

    docs = (
        load_table(spark, sf, "documents")
        .filter(F.length("text") >= _SRC_W * _SRC_H * 3)
        .select("doc_id", F.substring("text", 1, _SRC_W * _SRC_H * 3).alias("s"))
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_bmp(
                            _SRC_W, _SRC_H, bytes(ord(c) % 256 for c in s)
                        )
                        for s in pdf["s"]
                    ],
                }
            )

    return docs.mapInPandas(fn, "doc_id long, content binary")


def llm_image_dhash(spark: SparkSession, sf: str) -> DataFrame:
    """B32×B29 — perceptual dHash over real decoded pixels: 64
    difference bits on the 9×8 nearest-neighbor gray grid, packed
    MSB-first into four 16-bit bands. Narrow mapInPandas, zero
    shuffle."""
    return dhash_bands(_doc_images(spark, sf))


def _gray_exprs() -> list[str]:
    """72 gray-cell expressions (9×8 grid, row-major), each an exact
    integer replay of decode→gray→resize_nn on the char-derived
    image."""
    out = []
    for y in range(_GH):
        sy = y * _SRC_H // _GH
        for x in range(_GW + 1):
            sx = x * _SRC_W // (_GW + 1)
            p = (sy * _SRC_W + sx) * 3  # 0-indexed char offset
            cs = " + ".join(
                f"ascii(substring(s, {p + k + 1}, 1)) % 256" for k in range(3)
            )
            out.append(f"({cs}) // 3")
    return out


def _band_exprs() -> list[str]:
    """Four 16-bit band expressions over the gv[] gray list
    (1-indexed), bits MSB-first: bit (y,x) = gv[y·9+x] < gv[y·9+x+1]."""
    bands = []
    for i in range(4):
        terms = []
        for j in range(16):
            flat = i * 16 + j  # bit index 0..63, row-major over 8×8
            y, x = divmod(flat, _GW)
            a = y * (_GW + 1) + x + 1  # 1-indexed list positions
            terms.append(
                f"CASE WHEN gv[{a}] < gv[{a + 1}] THEN {1 << (15 - j)} ELSE 0 END"
            )
        bands.append("CAST(" + " + ".join(terms) + " AS INTEGER)")
    return bands


_GV = "[" + ", ".join(_gray_exprs()) + "]"
_B = _band_exprs()

_BANDS_CTE = f"""t AS (
  SELECT doc_id, substring(text, 1, {_SRC_W * _SRC_H * 3}) AS s
  FROM documents WHERE length(text) >= {_SRC_W * _SRC_H * 3}),
g AS (SELECT doc_id, {_GV} AS gv FROM t),
bands AS (SELECT doc_id,
  {_B[0]} AS b0, {_B[1]} AS b1, {_B[2]} AS b2, {_B[3]} AS b3
FROM g)"""

LLM_IMAGE_DHASH_SQL = f"""
WITH {_BANDS_CTE}
SELECT doc_id, b0, b1, b2, b3 FROM bands
"""

PROBES.append(
    Probe("llm_image_dhash", "B32", llm_image_dhash, LLM_IMAGE_DHASH_SQL)
)


def llm_image_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """B29×B32 — image near-dup pairs: band-blocked candidates (any
    shared 16-bit band; pigeonhole-complete to Hamming 3) + exact XOR
    popcount verify at the configured radius. The image twin of
    MinHash-LSH — no O(n²) stage."""
    return dhash_near_dup_pairs(
        dhash_bands(_doc_images(spark, sf)), max_hamming=_MAX_HAMMING
    )


LLM_IMAGE_NEAR_DUP_SQL = f"""
WITH {_BANDS_CTE},
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
         b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
  FROM bands a JOIN bands b
    ON a.doc_id < b.doc_id
   AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
SELECT id1, id2,
       CAST(bit_count(xor(a0::BIGINT, c0::BIGINT))
          + bit_count(xor(a1::BIGINT, c1::BIGINT))
          + bit_count(xor(a2::BIGINT, c2::BIGINT))
          + bit_count(xor(a3::BIGINT, c3::BIGINT)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(a0::BIGINT, c0::BIGINT))
    + bit_count(xor(a1::BIGINT, c1::BIGINT))
    + bit_count(xor(a2::BIGINT, c2::BIGINT))
    + bit_count(xor(a3::BIGINT, c3::BIGINT)) <= {_MAX_HAMMING}
"""

PROBES.append(
    Probe("llm_image_near_dup", "B29", llm_image_near_dup, LLM_IMAGE_NEAR_DUP_SQL)
)
