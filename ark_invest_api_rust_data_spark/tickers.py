"""Fund registry + source-URL router (SURVEY.md §2 S6, O1).

Mirrors the reference enums (/root/reference/src/util/ticker.rs:14-46,
/root/reference/src/util.rs:20-34) as plain Python enums — metadata on
the driver, never inside the data plane. The watermark date pushed into
the URL query string is predicate pushdown to the remote source.
"""

from __future__ import annotations

import datetime
import enum

from .operators.adapters import DataSource

DEFAULT_START_DAY = "2000-01-01"


class Source(enum.Enum):
    """Ingestion mode (/root/reference/src/util.rs:20-34)."""

    READ = "Read"
    ARK = "Ark"
    API_INCREMENTAL = "ApiIncremental"
    API_FULL = "ApiFull"
    ARKFUNDSIO_INCREMENTAL = "ArkFundsIoIncremental"
    ARKFUNDSIO_FULL = "ArkFundsIoFull"


class Ticker(enum.Enum):
    """25 funds; value = provider URL slug (/root/reference/src/util/
    ticker.rs:48-83)."""

    ARKVX = "ARK_VENTURE_FUND_ARKVX_HOLDINGS.csv"
    ARKF = "ARK_BLOCKCHAIN_&_FINTECH_INNOVATION"
    ARKG = "GENOMIC_REVOLUTION"
    ARKK = "INNOVATION"
    ARKQ = "AUTONOMOUS_TECH._&_ROBOTICS"
    ARKW = "NEXT_GENERATION_INTERNET"
    ARKX = "ARK_SPACE_&_DEFENSE_INNOVATION"
    ARKA = "ARKA"
    ARKZ = "ARKZ"
    ARKC = "ARKC"
    ARKD = "ARKD"
    ARKY = "ARKY"
    ARKB = "21SHARES_BITCOIN"
    PRNT = "THE_3D_PRINTING"
    IZRL = "ISRAEL_INNOVATIVE_TECHNOLOGY"
    EUROPE_ARKI = "artificial-intelligence-robotics"
    EUROPE_ARKG = "genomic-revolution"
    EUROPE_ARKK = "innovation"
    CYBR = "cybersecurity-and-data-privacy"
    CYCL = "circular-economy-enablers"
    FOOD = "sustainable-future-of-food"
    LIFE = "environmental-impact-100"
    LUSA = "usa-environmental-impact"
    NFRA = "global-sustainable-infrastructure"
    PMNT = "digital-payments-economy"

    @property
    def data_source(self) -> DataSource:
        if self is Ticker.ARKVX:
            return DataSource.ARK_VENTURE
        if self in (
            Ticker.ARKF, Ticker.ARKG, Ticker.ARKK, Ticker.ARKQ, Ticker.ARKW,
            Ticker.ARKX, Ticker.PRNT, Ticker.IZRL,
        ):
            return DataSource.ARK
        if self in (Ticker.ARKA, Ticker.ARKZ, Ticker.ARKC, Ticker.ARKD, Ticker.ARKY, Ticker.ARKB):
            return DataSource.SHARES21
        if self in (Ticker.EUROPE_ARKI, Ticker.EUROPE_ARKG, Ticker.EUROPE_ARKK):
            return DataSource.ARK_EUROPE
        return DataSource.RIZE

    def get_url(self) -> str:
        """Direct provider CSV URL (ticker.rs:113-133)."""
        ds = self.data_source
        if ds is DataSource.ARK_VENTURE:
            return f"https://assets.ark-funds.com/fund-documents/funds-etf-csv/{self.value}"
        if ds is DataSource.ARK:
            return (
                "https://assets.ark-funds.com/fund-documents/funds-etf-csv/"
                f"ARK_{self.value}_ETF_{self.name}_HOLDINGS.csv"
            )
        if ds is DataSource.SHARES21:
            return (
                "https://cdn.21shares-funds.com/uploads/fund-documents/us-bank/"
                f"holdings/product/current/{self.value}-Export.csv"
            )
        return f"https://europe.ark-funds.com/funds/{self.value}/full-fund-holdings-download/"

    def get_api_url(
        self,
        last_day: datetime.date | None,
        source: Source | None,
    ) -> str:
        """API URL with watermark pushdown (/root/reference/src/util.rs:
        499-534): the `start`/`date_from` query param IS the predicate
        pushed to the remote source."""
        start = last_day.isoformat() if last_day else DEFAULT_START_DAY
        if self.data_source is DataSource.ARK_EUROPE:
            return f"https://api.nexveridian.com/ark_holdings?ticker={self.name}&start={start}"
        if source in (Source.ARKFUNDSIO_INCREMENTAL, Source.ARKFUNDSIO_FULL):
            if source is Source.ARKFUNDSIO_FULL:
                start = DEFAULT_START_DAY
            return f"https://arkfunds.io/api/v2/etf/holdings?symbol={self.name}&date_from={start}"
        return f"https://api.nexveridian.com/ark_holdings?ticker={self.name}&start={start}"


# 17 tickers excluded from the scheduled run (/root/reference/src/main.rs:74-93).
SCHEDULED_EXCLUDED = {
    Ticker.ARKA, Ticker.ARKC, Ticker.ARKD, Ticker.ARKY, Ticker.ARKZ,
    Ticker.ARKB, Ticker.PRNT, Ticker.EUROPE_ARKI, Ticker.EUROPE_ARKG,
    Ticker.EUROPE_ARKK, Ticker.CYBR, Ticker.CYCL, Ticker.FOOD, Ticker.LIFE,
    Ticker.LUSA, Ticker.NFRA, Ticker.PMNT,
}
