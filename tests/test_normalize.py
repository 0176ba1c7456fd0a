"""Golden normalization tests mirroring the reference's test layers 1–2
(SURVEY §5): fixture builder with TSLA control row
(/root/reference/src/test_utils.rs:4-17), the 11-case security-rule
matrix (/root/reference/src/util/format/ticker.rs:319-464), string
cleanup, adapters, and the idempotence property."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from ark_invest_api_rust_data_spark.functions.rules import apply_security_rules
from ark_invest_api_rust_data_spark.functions.strings import clean_company_df, clean_ticker
from ark_invest_api_rust_data_spark.operators.adapters import DataSource
from ark_invest_api_rust_data_spark.operators.normalize import normalize

CANON_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("cusip", T.StringType()),
        T.StructField("company", T.StringType()),
        T.StructField("market_value", T.LongType()),
        T.StructField("shares", T.LongType()),
        T.StructField("share_price", T.DoubleType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


def default_df(spark, tickers, companies):
    """Mirror of defualt_df (sic): given parallel ticker/company lists,
    build the 8-col frame and append the TSLA control row that must
    pass through every transformation unchanged."""
    rows = [
        ("2024-01-01", t, "TESLA", c, 10, 10, 100.0, 10.0) for t, c in zip(tickers, companies)
    ]
    rows.append(("2024-01-01", "TSLA", "TESLA", "TSLA", 10, 10, 100.0, 10.0))
    return spark.createDataFrame(rows, CANON_SCHEMA)


def as_rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


RULE_MATRIX = [
    # (name, input tickers, input companies, expected tickers, expected companies)
    (
        "arkb",
        [None, "ARKB", "ARKB", "ARKB"],
        ["ARK BITCOIN ETF HOLDCO (ARKW)", "ARK BITCOIN ETF HOLDCO (ARKW)",
         "ARK BITCOIN ETF HOLDCO (ARKF)", "ARKB"],
        ["ARKB"] * 4,
        ["ARKB"] * 4,
    ),
    (
        "crlc",
        ["CRLC", None],
        ["CIRCLE INTERNET GROUP"] * 2,
        ["CRLC", "CRLC"],
        ["CIRCLE INTERNET GROUP"] * 2,
    ),
    ("crwv", ["CRWV", None], ["COREWEAVE"] * 2, ["CRWV"] * 2, ["COREWEAVE"] * 2),
    ("etor", ["ETOR", None], ["ETORO GROUP"] * 2, ["ETOR"] * 2, ["ETORO GROUP"] * 2),
    ("dkng", ["DKNG"], ["AFTKINGS"], ["DKNG"], ["DRAFTKINGS"]),
    ("mkfg", ["MKFG", None], ["MARKFORGEDG"] * 2, ["MKFG"] * 2, ["MARKFORGEDG"] * 2),
    ("lunr", ["LUNR", None], ["INTUITIVE MACHINES"] * 2, ["LUNR"] * 2, ["INTUITIVE MACHINES"] * 2),
    (
        "xyz",
        ["SQ", "SQ", "XYZ", "XYZ"],
        ["Block", "BLOCK", "Block", "BLOCK"],
        ["XYZ"] * 4,
        ["Block", "BLOCK", "Block", "BLOCK"],
    ),
    (
        "cash_usd",
        [None, None, None, "CASH&Other"],
        ["Cash & Cash Equivalents", "CASH & CASH EQUIVALENTS",
         "GOLDMAN FS TRSY OBLIG INST 468", "Cash & Other"],
        ["CASH_USD"] * 4,
        ["CASH_USD"] * 4,
    ),
    # R12: the TMSC typo is intentional upstream — preserved, not "fixed"
    ("tsm", ["TSM"], ["TAIWANMICONDUCTORSP"], ["TSM"], ["TMSC"]),
    (
        "rklb",
        ["RKLB", "RKLB", None],
        ["ROCKET LAB", "ROCKET LAB USA", "ROCKET LAB"],
        ["RKLB"] * 3,
        ["ROCKET LAB", "ROCKET LAB", "ROCKET LAB"],
    ),
]


@pytest.mark.parametrize("name,in_t,in_c,exp_t,exp_c", RULE_MATRIX, ids=[c[0] for c in RULE_MATRIX])
def test_security_rule_matrix(spark, name, in_t, in_c, exp_t, exp_c):
    out = apply_security_rules(default_df(spark, in_t, in_c))
    expected = default_df(spark, exp_t, exp_c)
    assert as_rows(out) == as_rows(expected)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("TSLA UW", "TSLA"),
        ("COIN UQ", "COIN"),
        ("SHOP CN", "SHOP"),
        ("DKNN", "DKNG"),
        ("ABC FP", "ABC"),
        ("X/U", "X"),
        ("PLAIN", "PLAIN"),
    ],
)
def test_ticker_cleanup(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "t: string").select(clean_ticker(F.col("t")).alias("t"))
    assert df.first()["t"] == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("TESLA INC", "TESLA"),
        ("COINBASE GLOBAL", "COINBASE"),  # " GLOBAL" strip fires first
        ("Space Exploration Technologies Corp", "SpaceX"),
        ("DRAFTKINGS INC", "AFTKINGS"),  # "DR" first-occurrence strip artifact
        ("ROCKET LAB USA INC", "ROCKET LAB USA"),
        ("UIPATH INC - CLASS A", "UIPATH"),
        ("DISCOVERY", "Dassault Systemes"),
    ],
)
def test_company_cleanup(spark, raw, expected):
    df = clean_company_df(spark.createDataFrame([(raw,)], "company: string"))
    assert df.first()["company"] == expected


ARK_CSV_SCHEMA = (
    "date string, fund string, company string, ticker string, cusip string, "
    "shares string, `market value ($)` string, `weight (%)` string"
)
ARK_CSV_ROWS = [
    ("01/05/2024", "ARKK", "TESLA INC", "TSLA UW", "88160R101", "1,234", "$1,234,567.89", "9.87%"),
    ("01/05/2024", "ARKK", "COINBASE GLOBAL", "COIN UQ", "19260Q107", "567", "$89,012.50", "1.23%"),
] + [
    # filler holdings keep the one disclaimer row under the 10% null
    # budget (real ARK files are ~40 rows + 1 disclaimer)
    ("01/05/2024", "ARKK", f"FILLER {i} INC", f"FIL{i}", f"CUSIP{i}", "100", "$1,000.00", "0.10%")
    for i in range(18)
] + [
    # trailing disclaimer row: unparseable date → dropped by P4
    ("Investors should carefully consider", None, None, None, None, None, None, None),
]


def test_normalize_ark_csv_shape(spark):
    df = spark.createDataFrame(ARK_CSV_ROWS, ARK_CSV_SCHEMA)
    out = normalize(df)
    rows = as_rows(out)
    assert out.columns == [
        "date", "ticker", "cusip", "company", "market_value", "shares", "share_price", "weight",
    ]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "date", "string", "string", "string", "bigint", "bigint", "double", "double",
    ]
    assert len(rows) == 20  # disclaimer row filtered
    tsla = next(r for r in rows if r[1] == "TSLA")
    assert tsla == (
        datetime.date(2024, 1, 5), "TSLA", "88160R101", "TESLA", 1234567, 1234,
        round(1234567 / 1234, 2), 9.87,
    )
    coin = next(r for r in rows if r[1] == "COIN")
    assert coin[3] == "COINBASE" and coin[4] == 89012 and coin[7] == 1.23


def test_normalize_idempotent(spark):
    df = spark.createDataFrame(ARK_CSV_ROWS, ARK_CSV_SCHEMA)
    once = normalize(df)
    twice = normalize(once)
    assert as_rows(once) == as_rows(twice)
    assert once.schema == twice.schema


def test_normalize_short_variant(spark):
    """With explicit Europe dispatch (no ARKVX null-pad in that chain,
    data_source.rs:11-15) a weights-only frame yields the 5-col variant
    (util.rs:489-494)."""
    df = spark.createDataFrame(
        [("2024-01-05", "ABC", "IE000ABC", "SOME COMPANY PLC", "4.56%")],
        "date string, ticker string, cusip string, company string, `weight (%)` string",
    )
    out = normalize(df, DataSource.ARK_EUROPE)
    assert out.columns == ["date", "ticker", "cusip", "company", "weight"]
    r = out.first()
    # " CO" replace-all mangles " COMPANY"→"MPANY" in the reference
    # too (util.rs:362) — faithful, not a bug
    assert r["weight"] == 4.56 and r["company"] == "SOMEMPANY"


def test_normalize_default_path_null_pads(spark):
    """Parity quirk: in the source=None path the ARKVX adapter always
    runs (util.rs:161) and null-pads any frame lacking market_value —
    so the default path always emits the 8-col schema."""
    df = spark.createDataFrame(
        [("2024-01-05", "ABC", "IE000ABC", "SOME COMPANY PLC", "4.56%")],
        "date string, ticker string, cusip string, company string, `weight (%)` string",
    )
    out = normalize(df)
    assert out.columns == [
        "date", "ticker", "cusip", "company", "market_value", "shares", "share_price", "weight",
    ]
    r = out.first()
    assert r["market_value"] is None and r["share_price"] is None
    assert r["weight"] == 4.56 and r["company"] == "SOMEMPANY"


def test_date_format_budget_rejects_wrong_format(spark):
    """>10% unparseable under M/d/yyyy → falls through to ISO."""
    rows = [(f"2024-01-{d:02d}",) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "date string").withColumns(
        {"ticker": F.lit("TSLA"), "cusip": F.lit("X"), "company": F.lit("TESLA"),
         "weight": F.lit(1.0)}
    )
    out = normalize(df)
    assert out.count() == 20
    assert dict(out.dtypes)["date"] == "date"
    assert out.agg(F.min("date")).first()[0] == datetime.date(2024, 1, 1)


def test_rename_asymmetry_quirk(spark):
    """P2 quirk: guard checks `weight ($)` but renames `weight (%)` —
    with only `weight ($)` present (no `weight (%)`), nothing renames
    and weight is absent → normalize fails the final projection, same
    observable outcome as the reference's hard error."""
    df = spark.createDataFrame(
        [("2024-01-05", "T", "C", "COMP", "1.0")],
        "date string, ticker string, cusip string, company string, `weight ($)` string",
    )
    with pytest.raises(Exception):
        normalize(df).collect()


def test_company_chain_fused_udf_matches_expression_tier(spark):
    """The fused single-pass pandas-UDF variant (bench comparison
    point, ROADMAP #2) must agree with the codegen'd expression tier
    on every curated case AND on a real text sample."""
    from ark_invest_api_rust_data_spark.functions.strings import company_chain_fused
    from ark_invest_api_rust_data_spark.plans.parity import _company_bulk_input

    cases = [
        ("TESLA INC",), ("COINBASE GLOBAL",),
        ("Space Exploration Technologies Corp",), ("DRAFTKINGS INC",),
        ("UIPATH INC - CLASS A",), ("DISCOVERY",), ("  trailing   ",),
        (None,), ("",),
    ]
    df = spark.createDataFrame(cases, "company: string")
    expr_out = [r["company"] for r in clean_company_df(df).collect()]
    fused_out = [
        r["c"] for r in df.select(company_chain_fused(F.col("company")).alias("c")).collect()
    ]
    assert expr_out == fused_out

    import os

    smoke = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    bulk = _company_bulk_input(spark, smoke).limit(500)
    a = {r["id"]: r["company"] for r in clean_company_df(bulk).collect()}
    b = {
        r["id"]: r["c"]
        for r in bulk.select("id", company_chain_fused(F.col("company")).alias("c")).collect()
    }
    assert a == b
