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

import numpy as np
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
        # would drift vs the batch twin's single division. Half-AWAY-
        # from-zero to match the batch twin's F.round (HALF_UP): pandas
        # .round() is banker's half-to-even and diverges on exact .5
        # cents (same fix as tws.py, ADVICE r2).
        v = pdf["value"].mul(100)
        cents += int((v.abs().add(0.5).pipe(np.floor) * np.sign(v)).sum())
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


# ---------------------------------------------------------------- sessions
SESSION_OUTPUT_SCHEMA = (
    "user_id long, s_start timestamp, s_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"
_US = 1_000_000


def _update_session_state(gap_us: int):
    """Build the applyInPandasWithState function for gap-based
    sessionization with EventTimeTimeout expiry.

    State: ONE open session per user (start, last-event, count) —
    O(users) not O(events). A new event either extends the open
    session (≤ gap after its last event) or closes it (emitted) and
    opens a new one. When the event-time watermark passes
    last_event + gap the timeout fires and the final session is
    emitted and the state removed — the mechanism a TTL/expiry needs
    at 100 TB so abandoned keys don't pin the state store forever.

    Batches are processed in event-time order WITHIN each micro-batch;
    cross-batch disorder is bounded by the watermark (same contract as
    the native session_window twin)."""

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key

        def emit(start_us, last_us, n):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "s_start": [pd.Timestamp(start_us, unit="us")],
                    "s_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        # one batch may hand the group over as several Arrow chunks —
        # gather, then process the WHOLE batch in event-time order
        all_ts: list = []
        for pdf in pdfs:
            all_ts.extend(pdf["ts"].tolist())
        for ts in sorted(all_ts):
            ev_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, last_us, n = ev_us, ev_us, 1
            elif ev_us - last_us <= gap_us:
                last_us, n = max(last_us, ev_us), n + 1
            else:
                yield emit(start_us, last_us, n)
                start_us, last_us, n = ev_us, ev_us, 1

        state.update((start_us, last_us, n))
        # expire when the watermark passes the session's close edge
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return update


def user_sessions_stateful(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """B22/B24 custom tier — gap sessionization as an arbitrary
    stateful operator with event-time TIMEOUT expiry (the semantics
    native session_window hides). Streaming only; the batch twin IS
    session_counts(events) from streaming/windows.py."""
    value, unit = gap.split()
    gap_us = int(value) * {"seconds": 1, "minutes": 60, "hours": 3600}[
        unit.rstrip("s") + "s"
    ] * _US
    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session_state(gap_us),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------- EWMA
EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma long"
EWMA_STATE_SCHEMA = "n long, r long, last_ts_us long, last_eid long"


def _update_ewma_state(alpha_den: int, value_scale: int):
    """applyInPandasWithState updater for the streaming EWMA twin of
    operators/events.ewma — same integer contract (floor(value·scale)
    quantization, r' = ((alpha_den−1)·r + v) floor-div alpha_den,
    (ts, event_id) order), state is (n, r, last-key): O(users), not
    O(events).

    Order contract: the fold is order-SENSITIVE, so the stream must
    deliver micro-batches in non-decreasing (ts, event_id) order per
    user (a partitioned ingest naturally does); rows WITHIN a batch
    are sorted here.  Cross-batch disorder raises loudly instead of
    silently computing a different fold."""

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, r, lts, leid = state.get
        else:
            n, r, lts, leid = 0, 0, -(2**63), -(2**63)
        rows = []
        for pdf in pdfs:
            for ts, eid, val in zip(
                pdf["ts"], pdf["event_id"], pdf["value"]
            ):
                rows.append(
                    (int(pd.Timestamp(ts).value // 1000), int(eid), float(val))
                )
        rows.sort()
        a1 = alpha_den - 1
        for ts_us, eid, val in rows:
            if (ts_us, eid) <= (lts, leid):
                raise ValueError(
                    "ewma_stateful: out-of-order delivery across "
                    "micro-batches violates the ordered-fold contract "
                    f"(user {user_id}: saw key ({ts_us}, {eid}) after "
                    f"({lts}, {leid}))"
                )
            import math

            v = math.floor(val * value_scale)
            r = v if n == 0 else (a1 * r + v) // alpha_den  # // floors
            n += 1
            lts, leid = ts_us, eid
        state.update((n, r, lts, leid))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "ewma": [r]}
        )

    return update


def user_ewma_stateful(
    events: DataFrame, alpha_den: int = 4, value_scale: int = 1000
) -> DataFrame:
    """B22/B24 custom tier — streaming twin of the batch integer EWMA
    (operators/events.ewma): per-user smoothed value maintained across
    micro-batches with O(users) state.  Streaming frames only; the
    batch twin IS operators.events.ewma (equivalence pytest-proven on
    in-order delivery; disorder fails loudly)."""
    if not events.isStreaming:
        from ..operators.events import ewma

        return ewma(events)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma_state(alpha_den, value_scale),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ k-mins twin
KMINS_OUTPUT_SCHEMA = (
    "event_type string, n_rows_seen long, mins array<long>, est_distinct long"
)
KMINS_STATE_SCHEMA = "n long, mins array<long>"


def _update_kmins_state(k: int):
    """applyInPandasWithState updater for the streaming k-mins twin of
    operators/sketch.kmins_distinct: per-group registers folded across
    micro-batches by elementwise min — O(groups · k) state, and the
    fold is order-INSENSITIVE (min is commutative), so unlike the EWMA
    twin there is no delivery-order contract to enforce. The per-row
    hash is operators.sketch.py_kmins_positions — the same constants
    the JVM expression and the DuckDB oracle use."""

    def update(key, pdfs, state):
        import pandas as pd

        from ..operators.sketch import (
            KMINS_M,
            py_kmins_estimate,
            py_kmins_positions,
        )

        (event_type,) = key
        if state.exists:
            n, mins = state.get
            mins = list(mins)
        else:
            n, mins = 0, [KMINS_M] * k
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                pos = py_kmins_positions(str(int(uid)), k)
                for i in range(k):
                    if pos[i] < mins[i]:
                        mins[i] = pos[i]
                n += 1
        state.update((n, mins))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_rows_seen": [n],
                "mins": [mins],
                "est_distinct": [py_kmins_estimate(mins)],
            }
        )

    return update


def kmins_distinct_stateful(events: DataFrame, k: int = 32) -> DataFrame:
    """B9 streaming twin — distinct users per event type maintained
    across micro-batches with O(groups · k) state; register-identical
    to the batch sketch after any prefix of the stream (mins only ever
    decrease; merge is elementwise min, the same operation
    operators/sketch.kmins_merge exposes for batch unions).

    Batch frames fall back to the batch operator (minus the
    n_rows_seen column, which only exists to pick the latest update
    row in a memory sink)."""
    if not events.isStreaming:
        from ..operators.sketch import kmins_distinct

        return kmins_distinct(events, "user_id", ["event_type"], k=k)
    return events.groupBy("event_type").applyInPandasWithState(
        _update_kmins_state(k),
        outputStructType=KMINS_OUTPUT_SCHEMA,
        stateStructType=KMINS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
