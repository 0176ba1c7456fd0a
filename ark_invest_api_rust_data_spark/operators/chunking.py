"""Document chunking for training-sequence prep (SURVEY.md §2 B31
extension): split each document into overlapping token windows — the
standard sliding-window chunker (window W, stride S, overlap W−S) used
to turn long documents into model-context-sized training rows.

Chunk-count contract (HF ``return_overflowing_tokens`` semantics):
``m = 1 + ceil(max(n − W, 0) / S)`` chunks per n-token document —
every token is covered, the final chunk may be shorter than W, and a
document shorter than W yields exactly one chunk. Pure integer math,
replicated verbatim in the DuckDB oracle.

Scale shape: tokenize → posexplode over a computed start-index array —
a narrow map followed by a row-multiplying generator, NO shuffle; at
100 TB this runs at scan speed and the output lands partition-local
(downstream packing/shuffling is the caller's choice). Companion to
``sampling.sequence_pack`` (which packs chunks into fixed token
budgets).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import tokens


def chunk_documents(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into (doc, chunk_id, chunk_text,
    chunk_tokens) rows under the sliding-window contract above."""
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}, {stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would drop tokens")
    from .dedup import _spread

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # m = 1 + ceil(max(n - W, 0) / S), exact integer arithmetic
    m = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("long")
    base = _spread(df).select(
        F.col(id_col), toks.alias("_toks"), m.alias("_m")
    )
    chunk = F.slice(
        F.col("_toks"), F.col("_i") * F.lit(stride) + F.lit(1), window
    )
    return (
        base.select(
            id_col,
            F.posexplode(F.sequence(F.lit(0), F.col("_m") - F.lit(1))).alias(
                "_pos", "_i"
            ),
            "_toks",
        )
        .select(
            id_col,
            F.col("_i").cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )
