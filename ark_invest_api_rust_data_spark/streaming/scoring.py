"""Streaming document scoring against a static corpus-trained model
(B23×B31): the online half of unigram-LM quality filtering — documents
arrive continuously and are scored against the vocabulary statistics
of the (static) training corpus.

Two tiers, covering the two Structured Streaming join surfaces:

* ``enrich_stream`` — a DIRECT stream-static join inside the streaming
  query: stream docs → explode tokens (stateless narrow map) → inner
  join the static vocab table. Stream-static joins are stateless (no
  watermark, no state store): each micro-batch joins the static side
  as a plain batch join, and AQE broadcasts the vocab while it fits —
  the stream side never shuffles. Emits per-token enriched rows in
  append mode.

* ``start_scored_stream`` — per-document exact scores via
  foreachBatch: per-doc aggregation inside a micro-batch is a BATCH
  aggregation (append-mode streaming can't aggregate without event
  time, and documents have none), so each batch runs the same
  deterministic math as ``operators.text.unigram_lm_score``'s scoring
  pass against the static count table and writes idempotently
  (overwrite into src=b<N> partition dirs — crash replay replaces, not
  duplicates; same layout contract as streaming/ingest.py).

Scale: the static vocab is vocabulary-sized (Heaps-law ∝ √corpus), so
the per-batch join is broadcast; state is ZERO for both tiers — this
loop runs forever without watermark tuning or state-store growth.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.text import tokens


def train_vocab(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Static side: corpus token counts + the corpus total (attached as
    a column so the stream side needs no second static frame)."""
    counts = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return counts.crossJoin(F.broadcast(total))


def enrich_stream(
    stream_docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stream-static inner join, stateless append: one output row per
    (document, token) with the token's corpus count. Tokens absent
    from the corpus vocabulary drop out (inner join) — the count of
    surviving rows vs n_tokens is itself an OOV signal."""
    toks = stream_docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    return toks.join(vocab, "tok").select(id_col, "tok", "cnt", "total")


def score_batch(batch: DataFrame, vocab: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact per-doc scoring of one (micro-)batch against the static
    vocab — the same deterministic columns as unigram_lm_score, but
    with OOV handling (left join; OOV tokens score cnt=0 and are
    counted separately) since streamed docs may contain tokens the
    corpus never saw."""
    toks = batch.select(F.col(id_col), F.explode(tokens(F.col("text"))).alias("tok"))
    joined = toks.join(F.broadcast(vocab.select("tok", "cnt")), "tok", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("sum_token_df"),
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("min_token_df"),
        (
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_token_df"),
    )


def start_scored_stream(
    spark: SparkSession,
    stream_docs: DataFrame,
    vocab: DataFrame,
    out_root: str,
    checkpoint: str,
    query_name: str = "lm_scoring",
) -> StreamingQuery:
    """foreachBatch scoring loop: per-batch exact scores written
    idempotently under ``out_root/scores/src=b<N>/``."""
    vocab = vocab.localCheckpoint(eager=True)  # don't recompute per batch

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        (
            score_batch(batch, vocab)
            .write.mode("overwrite")
            .parquet(f"{out_root}/scores/src=b{batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
