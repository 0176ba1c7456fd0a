"""Spark 4 Python Data Source for the holdings HTTP ingest
(SURVEY.md §2 S3/S6 elevated to an engine-native source;
/root/reference/src/util/data_reader.rs:19-47, src/main.rs:62-98).

The reference fans per-ticker fetches across a blocking thread pool on
ONE node. Expressed as a DataSource, each ticker becomes an
``InputPartition``: the fetch + CSV parse runs ON EXECUTORS, so a
large fund universe fans out across the cluster, lands directly in
the scan (no driver round-trip, no createDataFrame of fetched bodies),
and composes with every downstream DataFrame op — the idiomatic
DataSourceV2 shape for a pull-based remote source.

Schema is provider-agnostic — one row per CSV data row:

    ticker STRING, row_idx BIGINT, fields MAP<STRING, STRING>

``row_idx`` is the parse order within the document (the positional
information the Europe preamble slice needs — SURVEY §7 hard part 3);
``fields`` maps the document's own header names to raw cell strings,
so the adapter layer (operators/adapters.py) can pivot and normalize
exactly as it does for driver-fetched bodies.

Options:

* ``tickers`` — comma-separated fund list (required).
* ``fixture_dir`` — read ``{dir}/{TICKER}.csv`` instead of HTTP; the
  recorded-fixture path used by tests (SURVEY §5: no live-API tests).

The fetch uses the same UA/header set as the driver reader. One
document per ticker per day is small; the win is fan-out width and
locality, not per-document parallelism.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "ticker STRING, row_idx BIGINT, fields MAP<STRING, STRING>"


class _TickerPartition(InputPartition):
    def __init__(self, ticker: str, location: str, is_url: bool):
        self.ticker = ticker
        self.location = location
        self.is_url = is_url


class HoldingsHttpReader(DataSourceReader):
    def __init__(self, options: dict):
        tickers = [t.strip() for t in options.get("tickers", "").split(",") if t.strip()]
        if not tickers:
            raise ValueError("ark_holdings: 'tickers' option is required")
        self._fixture_dir = options.get("fixture_dir")
        self._parts: list[_TickerPartition] = []
        for t in tickers:
            if self._fixture_dir:
                self._parts.append(
                    _TickerPartition(t, f"{self._fixture_dir}/{t}.csv", is_url=False)
                )
            else:
                # late import: the URL router needs only stdlib
                from ..tickers import Ticker

                self._parts.append(_TickerPartition(t, Ticker[t].get_url(), is_url=True))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per ticker: the unit of fetch fan-out
        return self._parts

    def read(self, partition: _TickerPartition) -> Iterator[tuple]:
        if partition.is_url:
            from .data_reader import http_fetch

            body = http_fetch(partition.location)
        else:
            with open(partition.location, encoding="utf-8") as f:
                body = f.read()
        reader = csv.reader(io.StringIO(body))
        try:
            header = next(reader)
        except StopIteration:
            return
        for idx, row in enumerate(reader):
            fields = dict(zip(header, row))
            yield (partition.ticker, idx, fields)


class HoldingsDataSource(DataSource):
    """``spark.read.format("ark_holdings")`` — register with
    ``spark.dataSource.register(HoldingsDataSource)`` first."""

    @classmethod
    def name(cls) -> str:
        return "ark_holdings"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return HoldingsHttpReader(dict(self.options))
