"""URL-router golden tests mirroring /root/reference/src/util/ticker.rs
:143-166 plus API-URL watermark-pushdown cases (util.rs:499-534)."""

from __future__ import annotations

import datetime

import pytest

from ark_invest_api_rust_data_spark.tickers import SCHEDULED_EXCLUDED, Source, Ticker


@pytest.mark.parametrize(
    "ticker,expected",
    [
        (
            Ticker.ARKVX,
            "https://assets.ark-funds.com/fund-documents/funds-etf-csv/"
            "ARK_VENTURE_FUND_ARKVX_HOLDINGS.csv",
        ),
        (
            Ticker.ARKK,
            "https://assets.ark-funds.com/fund-documents/funds-etf-csv/"
            "ARK_INNOVATION_ETF_ARKK_HOLDINGS.csv",
        ),
        (
            Ticker.ARKA,
            "https://cdn.21shares-funds.com/uploads/fund-documents/us-bank/"
            "holdings/product/current/ARKA-Export.csv",
        ),
        (
            Ticker.EUROPE_ARKI,
            "https://europe.ark-funds.com/funds/artificial-intelligence-robotics/"
            "full-fund-holdings-download/",
        ),
        (
            Ticker.CYBR,
            "https://europe.ark-funds.com/funds/cybersecurity-and-data-privacy/"
            "full-fund-holdings-download/",
        ),
    ],
)
def test_get_url_golden(ticker, expected):
    assert ticker.get_url() == expected


def test_api_url_watermark_pushdown():
    d = datetime.date(2024, 1, 7)
    assert (
        Ticker.ARKK.get_api_url(d, Source.API_INCREMENTAL)
        == "https://api.nexveridian.com/ark_holdings?ticker=ARKK&start=2024-01-07"
    )
    assert (
        Ticker.ARKK.get_api_url(None, Source.API_INCREMENTAL)
        == "https://api.nexveridian.com/ark_holdings?ticker=ARKK&start=2000-01-01"
    )
    assert (
        Ticker.ARKK.get_api_url(d, Source.ARKFUNDSIO_INCREMENTAL)
        == "https://arkfunds.io/api/v2/etf/holdings?symbol=ARKK&date_from=2024-01-07"
    )
    # Full mode ignores the watermark (util.rs:520-524)
    assert (
        Ticker.ARKK.get_api_url(d, Source.ARKFUNDSIO_FULL)
        == "https://arkfunds.io/api/v2/etf/holdings?symbol=ARKK&date_from=2000-01-01"
    )
    # Europe tickers route to nexveridian regardless of source
    assert (
        Ticker.EUROPE_ARKK.get_api_url(d, Source.API_INCREMENTAL)
        == "https://api.nexveridian.com/ark_holdings?ticker=EUROPE_ARKK&start=2024-01-07"
    )


def test_scheduled_fanout_is_8_of_25():
    """main.rs:74-93 — 17 excluded, 8 scheduled."""
    assert len(list(Ticker)) == 25
    assert len(SCHEDULED_EXCLUDED) == 17
    scheduled = [t for t in Ticker if t not in SCHEDULED_EXCLUDED]
    assert len(scheduled) == 8
    assert Ticker.ARKK in scheduled and Ticker.ARKVX in scheduled
    assert Ticker.PRNT not in scheduled
