"""HTTP → DataFrame readers (SURVEY.md §2 S3/S4).

The fetch itself is inherently single-node (one small CSV/JSON document
per ETF per day) and stays on the driver, exactly like the reference's
reqwest client (/root/reference/src/util/data_reader.rs:19-47). The
parse then hands off to Spark (``spark.read.csv/json``) so everything
downstream is distributed and schema-inferred the same way Polars
inferred it.

``fetcher`` is injectable so tests run on recorded fixture bodies with
zero network (SURVEY §5 — replaces the reference's live API tests).
"""

from __future__ import annotations

import csv as _csv
import io
import json
import os
import tempfile
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.adapters import ROW_IDX

# Browser-ish UA + gzip, like the reference's header set
# (/root/reference/src/util/data_reader.rs:20-27).
_HEADERS = {
    "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
    "Accept-Encoding": "identity",
    "Accept": "text/csv,application/json,*/*",
}

Fetcher = Callable[[str], str]


def http_fetch(url: str) -> str:
    """GET with status check (reference errors on non-success)."""
    req = urllib.request.Request(url, headers=_HEADERS)
    with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
        if resp.status != 200:
            raise OSError(f"GET {url} -> {resp.status}")
        return resp.read().decode("utf-8", errors="replace")


def _dedup_header(text: str) -> tuple[str, bool]:
    """Replicate Polars' duplicate-header artifact: 2nd+ occurrence of
    a header name becomes ``_duplicated_{i}`` — the trigger column for
    the Europe raw-CSV adapter (D6)."""
    buf = io.StringIO(text)
    reader = _csv.reader(buf)
    try:
        header = next(reader)
    except StopIteration:
        return text, False
    seen: dict[str, int] = {}
    out_header, had_dup = [], False
    for name in header:
        if name in seen:
            out_header.append(f"_duplicated_{seen[name] - 1}")
            seen[name] += 1
            had_dup = True
        else:
            seen[name] = 1
            out_header.append(name)
    if not had_dup:
        return text, False
    rest = text.split("\n", 1)[1] if "\n" in text else ""
    w = io.StringIO()
    _csv.writer(w, lineterminator="\n").writerow(out_header)
    return w.getvalue() + rest, True


def csv_to_df(spark: SparkSession, text: str) -> DataFrame:
    """CSV body → inferred DataFrame (S3). When the duplicate-header
    artifact is present, a parse-order ``_row_idx`` column is attached
    (single small file → single partition → file order preserved) so
    the positional preamble slice (D6) is distribution-safe."""
    text, had_dup = _dedup_header(text)
    fd, path = tempfile.mkstemp(suffix=".csv")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    if had_dup:
        from pyspark.sql import functions as F

        df = df.coalesce(1).withColumn(ROW_IDX, F.monotonically_increasing_id())
    return df


def json_to_df(spark: SparkSession, text: str) -> DataFrame:
    """JSON body → inferred DataFrame (S4). Accepts either a record
    list or a single object (the arkfunds.io envelope)."""
    parsed = json.loads(text)
    records = parsed if isinstance(parsed, list) else [parsed]
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in records]))


def explode_holdings(df: DataFrame) -> DataFrame:
    """U6 — arkfunds.io ``holdings: array<struct>`` → flat rows
    (/root/reference/src/util.rs:537-546)."""
    from pyspark.sql import functions as F

    return df.select(F.explode("holdings").alias("h")).select("h.*")


def csv_scan_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """S5 hardened for dirty 100 TB inputs: distributed CSV scan in
    PERMISSIVE mode with a corrupt-record column — rows that fail the
    schema land in a quarantine frame (with their raw text preserved
    for replay/debugging) instead of failing the job or silently
    nulling fields. Returns ``(good, quarantined)``.

    The scan is cached before splitting: Spark computes the corrupt
    column during parsing, and filtering on it from two separate
    uncached scans is explicitly unsupported (each scan would re-parse
    and could disagree); one cache keeps good/bad consistent views of
    the same parse.
    """
    from pyspark.sql import functions as F

    full_schema = schema + ", _corrupt_record STRING"
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full_schema)
        .csv(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
