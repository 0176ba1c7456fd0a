"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B-streaming custom tier).

Operator: per-user running counters with threshold alerts — for every
user, maintain (n_events, total_value) across micro-batches and emit
one row per batch-with-data per user carrying the running totals and
an ``alerted`` flag once total_value crosses a threshold. The batch
twin is a plain groupBy aggregation of the final state (proven equal
in tests/test_streaming.py).

State design for scale: keyed by user_id (state store partitions with
the shuffle), value is two numbers — O(distinct users) state, no
per-event retention; a production variant would add a state TTL via
``GroupStateTimeout.ProcessingTimeTimeout``.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, alerted boolean"
STATE_SCHEMA = "n long, total_cents long"


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # state accumulates in exact integer CENTS — a running float
        # would drift vs the batch twin's single division
        cents += int(pdf["value"].mul(100).round().sum())
    state.update((n, cents))
    total = float(cents) / 100.0
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "alerted": [total >= 1000.0],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: arbitrary stateful op over grouped Arrow batches.
    Batch twin for equivalence checks: one groupBy aggregation."""
    if events.isStreaming:
        return (
            events.groupBy("user_id")
            .applyInPandasWithState(
                _update_user_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    import pyspark.sql.functions as F

    cents = F.round(F.col("value") * 100).cast("long")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_value"),
        ((F.sum(cents).cast("double") / F.lit(100.0)) >= 1000.0).alias("alerted"),
    )
