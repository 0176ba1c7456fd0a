"""Provider schema adapters (SURVEY.md §2 D1–D6).

Each adapter is guarded by which columns actually arrived (the
reference branches on runtime column lists,
/root/reference/src/util/format/data_source.rs) — in Spark the guard is
a free ``df.columns`` check, no action. Adapters are idempotent: once
applied, their trigger columns are gone.
"""

from __future__ import annotations

import enum

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Row-order column our CSV reader attaches when it detects the Europe
# duplicate-header artifact; Spark rows are unordered, so the
# positional preamble slice (data_source.rs:137) needs an explicit
# order key carried from parse time (SURVEY §7 hard part 3).
ROW_IDX = "_row_idx"


class DataSource(enum.Enum):
    """Provider enum (/root/reference/src/util/ticker.rs:4-10)."""

    ARK_VENTURE = "ArkVenture"
    ARK = "Ark"
    SHARES21 = "Shares21"
    ARK_EUROPE = "ArkEurope"
    RIZE = "Rize"


def _null_pad(df: DataFrame, with_ticker: bool, with_date: bool) -> DataFrame:
    cols = {}
    if with_date:
        cols["date"] = F.current_date()
    if with_ticker:
        cols["ticker"] = F.lit(None).cast("string")
    cols["market_value"] = F.lit(None).cast("long")
    cols["shares"] = F.lit(None).cast("long")
    cols["share_price"] = F.lit(None).cast("double")
    return df.withColumns(cols)


def format_21shares(df: DataFrame) -> DataFrame:
    """D2 — trigger: 'Weightings' present (data_source.rs:20-58)."""
    if "Weightings" not in df.columns:
        return df
    df = df.withColumnsRenamed(
        {
            "Date": "date",
            "StockTicker": "ticker",
            "CUSIP": "cusip",
            "SecurityName": "company",
            "Shares": "shares",
            "Price": "share_price",
            "MarketValue": "market_value",
            "Weightings": "weight",
        }
    )
    return df.drop("Account", "NetAssets", "SharesOutstanding", "CreationUnits", "MoneyMarketFlag")


def format_arkvx(df: DataFrame) -> DataFrame:
    """D3 — ARK Venture CSV (data_source.rs:60-83)."""
    if "CUSIP" in df.columns:
        df = df.withColumnsRenamed({"CUSIP": "cusip", "weight (%)": "weight"})
    if "market value ($)" not in df.columns and "market_value" not in df.columns:
        df = df.withColumns(
            {
                "market_value": F.lit(None).cast("long"),
                "shares": F.lit(None).cast("long"),
                "share_price": F.lit(None).cast("double"),
            }
        )
    return df


def format_europe(df: DataFrame) -> DataFrame:
    """D4 — Europe web CSV with Currency column (data_source.rs:85-108)."""
    if "Currency" not in df.columns:
        return df
    df = df.drop("Currency").withColumnsRenamed(
        {"name": "company", "ISIN": "cusip", "Weight": "weight"}
    )
    return _null_pad(df, with_ticker=True, with_date=True)


def format_europe_arkfundsio(df: DataFrame) -> DataFrame:
    """D5 — trigger: columns EXACTLY [company,cusip,date,fund,weight,
    weight_rank] (data_source.rs:110-131)."""
    if df.columns != ["company", "cusip", "date", "fund", "weight", "weight_rank"]:
        return df
    df = df.drop("fund", "weight_rank")
    return _null_pad(df, with_ticker=True, with_date=False)


def format_europe_csv(df: DataFrame) -> DataFrame:
    """D6 — Europe raw CSV with duplicate-header artifact: drop the
    2-row junk preamble (positional — uses the parse-time row index),
    rename the 3 data columns positionally (data_source.rs:133-154)."""
    if "_duplicated_0" not in df.columns:
        return df
    if ROW_IDX in df.columns:
        df = df.filter(F.col(ROW_IDX) >= 2).drop(ROW_IDX)
    data_cols = [c for c in df.columns]
    df = df.select(
        *[F.col(old).alias(new) for old, new in zip(data_cols, ["company", "cusip", "weight"])]
    )
    return _null_pad(df, with_ticker=True, with_date=True)


def apply_provider_adapters(df: DataFrame, source: DataSource | None = None) -> DataFrame:
    """D1 dispatch (data_source.rs:6-18); source=None applies the full
    guard chain like df_format's else-branch (util.rs:158-162)."""
    if source is DataSource.ARK_VENTURE:
        return format_arkvx(df)
    if source is DataSource.ARK:
        return df
    if source is DataSource.SHARES21:
        return format_21shares(df)
    if source in (DataSource.ARK_EUROPE, DataSource.RIZE):
        return format_europe(format_europe_arkfundsio(format_europe_csv(df)))
    # unknown: run every guarded adapter (each no-ops unless triggered)
    df = format_europe_csv(df)
    df = format_europe_arkfundsio(df)
    df = format_21shares(df)
    df = format_arkvx(df)
    df = format_europe(df)
    return df
