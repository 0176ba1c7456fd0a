"""End-to-end pipeline tests with recorded-fixture fetchers (SURVEY §5:
no live HTTP in CI) — write/read round-trip, incremental watermark
merge, provider adapters through the real ingestion path, sort order."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from ark_invest_api_rust_data_spark.operators.adapters import DataSource
from ark_invest_api_rust_data_spark.operators.merge import canonical_sort, watermark
from ark_invest_api_rust_data_spark.operators.normalize import normalize
from ark_invest_api_rust_data_spark.pipeline import refresh_ticker
from ark_invest_api_rust_data_spark.sources.data_reader import csv_to_df, json_to_df
from ark_invest_api_rust_data_spark.sources.parquet_store import read_ticker, write_ticker
from ark_invest_api_rust_data_spark.tickers import Source, Ticker

ARK_CSV = "\n".join(
    ['date,fund,company,ticker,cusip,shares,"market value ($)","weight (%)"']
    + [f'01/0{d}/2024,ARKK,TESLA INC,TSLA UW,88160R101,"1,234","$1,234,567.89",9.87%'
       for d in range(1, 8)]
    + [f'01/0{d}/2024,ARKK,COINBASE GLOBAL,COIN UQ,19260Q107,567,"$89,012.50",1.23%'
       for d in range(1, 8)]
)

API_JSON_PAGE2 = (
    '[{"company": "TESLA", "cusip": "88160R101", "date": "2024-01-09",'
    ' "market_value": 999999.0, "share_price": 200.0, "shares": 5000.0,'
    ' "ticker": "TSLA", "weight": 9.99, "weight_rank": 1}]'
)

ARKFUNDSIO_JSON = (
    '{"symbol": "ARKK", "date_from": "2024-01-01", "holdings": ['
    '{"company": "TESLA", "cusip": "88160R101", "date": "2024-01-10",'
    ' "market_value": 888888.0, "share_price": 180.0, "shares": 4000.0,'
    ' "ticker": "TSLA", "weight": 8.88, "weight_rank": 1}]}'
)


def test_parquet_roundtrip(spark, tmp_path):
    """read_write_parquet golden test (util.rs:584-594)."""
    df = normalize(csv_to_df(spark, ARK_CSV))
    write_ticker(df, str(tmp_path), "ARKK")
    back = read_ticker(spark, str(tmp_path), "ARKK")
    assert back is not None
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.schema == df.schema


def test_refresh_bootstrap_then_incremental(spark, tmp_path):
    """Cold bootstrap (ApiFull-style CSV) then ApiIncremental: the
    second fetch's URL must carry the cache watermark (pushdown), and
    the merge must dedupe the overlap."""
    root = str(tmp_path)
    urls = []

    def fake_fetch(url: str) -> str:
        urls.append(url)
        return ARK_CSV

    out1 = refresh_ticker(spark, Ticker.ARKK, Source.ARK, root, fake_fetch)
    n1 = out1.count()
    assert n1 == 14

    def fake_api(url: str) -> str:
        urls.append(url)
        return API_JSON_PAGE2

    out2 = refresh_ticker(spark, Ticker.ARKK, Source.API_INCREMENTAL, root, fake_api)
    assert out2.count() == n1 + 1
    assert "start=2024-01-07" in urls[-1]  # watermark pushed to source

    # idempotent re-run: same update again → no growth
    out3 = refresh_ticker(spark, Ticker.ARKK, Source.API_INCREMENTAL, root, fake_api)
    assert out3.count() == n1 + 1


def test_arkfundsio_explode_path(spark, tmp_path):
    """U6: nested holdings list-of-structs is exploded/unnested
    (util.rs:537-546)."""
    out = refresh_ticker(
        spark, Ticker.ARKK, Source.ARKFUNDSIO_FULL, str(tmp_path), lambda url: ARKFUNDSIO_JSON
    )
    r = out.first()
    assert r["ticker"] == "TSLA" and r["market_value"] == 888888
    assert r["date"] == datetime.date(2024, 1, 10)


def test_europe_duplicate_header_csv(spark):
    """D6 through the real CSV reader: duplicate header → _duplicated_0
    artifact → 2-row preamble slice → positional rename."""
    text = "\n".join(
        [
            "col,col,col",
            "junk1,junk1,junk1",
            "junk2,junk2,junk2",
            "ACME HOLDINGS,IE00ACME,4.5",
            "OTHER PLC,IE00OTHR,2.5",
        ]
    )
    df = csv_to_df(spark, text)
    assert "_duplicated_0" in df.columns
    out = normalize(df, DataSource.ARK_EUROPE)
    rows = {r["cusip"]: r for r in out.collect()}
    assert set(rows) == {"IE00ACME", "IE00OTHR"}
    assert rows["IE00ACME"]["company"] == "ACME"  # " HOLDINGS" stripped? no: first-occ HOLDINGS
    assert rows["IE00ACME"]["date"] == datetime.date.today()
    assert rows["IE00ACME"]["weight"] == 4.5


def test_canonical_sort_order(spark):
    """U3: date asc, weight desc, nulls first (Polars nulls_last=false)."""
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 2), 1.0),
            (datetime.date(2024, 1, 1), 5.0),
            (datetime.date(2024, 1, 1), None),
            (None, 3.0),
            (datetime.date(2024, 1, 1), 9.0),
        ],
        "date date, weight double",
    )
    got = [tuple(r) for r in canonical_sort(df).collect()]
    assert got == [
        (None, 3.0),
        (datetime.date(2024, 1, 1), None),
        (datetime.date(2024, 1, 1), 9.0),
        (datetime.date(2024, 1, 1), 5.0),
        (datetime.date(2024, 1, 2), 1.0),
    ]


def test_watermark(spark):
    df = normalize(csv_to_df(spark, ARK_CSV))
    assert watermark(df) == datetime.date(2024, 1, 7)


def test_json_api_shape(spark):
    """B2 fixture shape: flat JSON records parse + normalize."""
    df = json_to_df(spark, API_JSON_PAGE2)
    out = normalize(df)
    r = out.first()
    assert r["share_price"] == 200.0 and r["shares"] == 5000
    assert out.columns[:4] == ["date", "ticker", "cusip", "company"]


def test_lake_partitioned_roundtrip(spark, tmp_path):
    """Scale-layout sink: hive-partitioned (ticker, date) lake with
    dynamic partition overwrite — an incremental merge must rewrite
    only the partitions it touches."""
    from ark_invest_api_rust_data_spark.sources.parquet_store import read_lake, write_lake

    root = str(tmp_path)
    df = normalize(csv_to_df(spark, ARK_CSV))
    write_lake(df, root)
    back = read_lake(spark, root)
    assert back.count() == df.count()
    # partition pruning: a ticker+date slice must read a narrow subset
    one = back.filter(
        (F.col("ticker") == "TSLA") & (F.col("date") == datetime.date(2024, 1, 3))
    )
    assert one.count() == 1
    # dynamic overwrite: rewrite ONE date with changed shares; other
    # partitions must survive
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    patch = df.filter(F.col("date") == datetime.date(2024, 1, 3)).withColumn(
        "shares", F.col("shares") * 2
    )
    write_lake(patch, root, mode="overwrite")
    back2 = read_lake(spark, root)
    assert back2.count() == df.count()  # other dates intact
    changed = back2.filter(
        (F.col("ticker") == "TSLA") & (F.col("date") == datetime.date(2024, 1, 3))
    ).first()
    assert changed["shares"] == 2468


def test_lake_bucketed_by_cusip_security_joins(spark, tmp_path):
    """Security-centric lake variant: cusip-bucketed holdings join a
    same-bucketed securities dim with NO shuffle Exchange, and a
    single-cusip lookup prunes buckets at the scan (the two query
    families the ticker=/date= hive layout cannot serve)."""
    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        security_history,
        write_lake_bucketed_by_cusip,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS t_cusip LOCATION '{tmp_path}/wh'")
    df = normalize(csv_to_df(spark, ARK_CSV))
    write_lake_bucketed_by_cusip(df, table="t_cusip.holdings_by_cusip", num_buckets=8)
    dim = df.select("cusip").distinct().withColumn("sector", F.lit("tech"))
    (
        dim.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "cusip")
        .sortBy("cusip")
        .saveAsTable("t_cusip.securities")
    )

    # model the fact-fact case: disable broadcast so the planner must
    # pick SMJ — matched bucket specs then elide both shuffles
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_cusip.holdings_by_cusip").join(
            spark.table("t_cusip.securities"), "cusip"
        )
        assert joined.count() == df.count()  # finalizes the adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    one_cusip = df.first()["cusip"]
    hist = security_history(spark, one_cusip, table="t_cusip.holdings_by_cusip")
    scan = hist._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in scan, scan  # bucket pruning
    assert hist.count() == df.filter(F.col("cusip") == one_cusip).count()

    spark.sql("DROP DATABASE t_cusip CASCADE")


def test_scheduled_run_fans_out_with_error_isolation(spark, tmp_path):
    """O5: the scheduled run hits exactly the 8 non-excluded tickers,
    and one ticker failing leaves the others intact (main.rs:62-98)."""
    from ark_invest_api_rust_data_spark.pipeline import scheduled_run
    from ark_invest_api_rust_data_spark.tickers import SCHEDULED_EXCLUDED, Source, Ticker

    calls = []

    def fetch(url: str) -> str:
        calls.append(url)
        if "ARKW" in url:
            raise OSError("simulated upstream 500")
        return ARK_CSV

    results = scheduled_run(
        spark, source=Source.ARK, root=str(tmp_path), fetcher=fetch, max_workers=4
    )
    expected = {t.name for t in Ticker if t not in SCHEDULED_EXCLUDED}
    assert set(results) == expected and len(expected) == 8
    assert isinstance(results["ARKW"], OSError)
    ok = [k for k, v in results.items() if v is None]
    assert len(ok) == 7  # everyone else succeeded
    import os

    assert os.path.exists(f"{tmp_path}/ARKK.parquet")
    assert not os.path.exists(f"{tmp_path}/ARKW.parquet")


def test_dtype_repair_golden(spark):
    """C9 (util.rs:452-476): mistyped numeric columns are repaired —
    float market_value/shares → long, long share_price/weight → double."""
    from ark_invest_api_rust_data_spark.functions.casts import repair_dtypes

    df = spark.createDataFrame(
        [(1234.0, 10.0, 100, 5)],
        "market_value double, shares double, share_price long, weight long",
    )
    out = repair_dtypes(df)
    assert dict(out.dtypes) == {
        "market_value": "bigint",
        "shares": "bigint",
        "share_price": "double",
        "weight": "double",
    }
    r = out.first()
    assert (r["market_value"], r["shares"], r["share_price"], r["weight"]) == (1234, 10, 100.0, 5.0)


def test_read_only_mode(spark, tmp_path):
    """O6: Source.READ serves the cache, errors when absent
    (util.rs:57-60)."""
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        refresh_ticker(spark, Ticker.ARKK, Source.READ, str(tmp_path))
    df = normalize(csv_to_df(spark, ARK_CSV))
    write_ticker(df, str(tmp_path), "ARKK")
    out = refresh_ticker(spark, Ticker.ARKK, Source.READ, str(tmp_path))
    assert out.count() == df.count()


def test_csv_backfill_roundtrip_with_cascade(spark, tmp_path):
    """Backfill entry point (merge_old_csv_to_parquet, util.rs:555-572):
    glob CSVs → merge with cache → sort → write. The reference formats
    the backfill frame multiple times, so a multi-step company cascade
    (ROCKET LAB USA INC → ROCKET LAB USA → ROCKET LAB) must reach its
    fixpoint here too, on BOTH the bootstrap and the merge path."""
    from ark_invest_api_rust_data_spark.pipeline import csv_backfill

    cascade_csv = "\n".join(
        ['date,fund,company,ticker,cusip,shares,"market value ($)","weight (%)"']
        + ['01/03/2024,ARKK,ROCKET LAB USA INC,RKLB UW,77312X108,100,"$1,000.00",1.00%']
    )
    csv_root = tmp_path / "csv"
    (csv_root / "ARKK").mkdir(parents=True)
    (csv_root / "ARKK" / "part1.csv").write_text(cascade_csv)
    root = str(tmp_path / "parquet")

    # bootstrap (no cache): cascade must be fully collapsed
    out = csv_backfill(spark, Ticker.ARKK, str(csv_root), root)
    assert out is not None
    row = out.filter(F.col("ticker") == "RKLB").first()
    assert row["company"] == "ROCKET LAB"

    # merge path (cache present): write a cache, backfill again
    write_ticker(normalize(csv_to_df(spark, ARK_CSV)), root, "ARKK")
    out2 = csv_backfill(spark, Ticker.ARKK, str(csv_root), root)
    assert out2.filter(F.col("ticker") == "RKLB").first()["company"] == "ROCKET LAB"
    assert out2.count() == 15  # 14 cache rows + 1 backfill row
    # round-trip: written cache equals the returned frame
    back = read_ticker(spark, root, "ARKK")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, out2.collect()))

    # missing dir → None
    assert csv_backfill(spark, Ticker.ARKQ, str(csv_root), root) is None


def test_daemon_bare_clock_day_rollover(spark, tmp_path):
    """A date-less HH:MM clock must re-arm schedule times when the
    observed time rolls backwards (midnight crossing)."""
    from ark_invest_api_rust_data_spark.pipeline import run_daemon

    runs = []

    def fetch(url):
        runs.append(url)
        return ARK_CSV

    ticks = iter(["22:00", "23:30", "00:10", "10:00", "22:00"])
    run_daemon(
        spark,
        root=str(tmp_path),
        fetcher=fetch,
        clock=lambda: next(ticks),
        sleeper=lambda s: None,
        max_cycles=5,
    )
    # 8 scheduled tickers × 3 firings: 22:00, then (post-rollover) 10:00
    # and 22:00 again — without the rollover reset the last would not fire
    assert len(runs) == 24


def test_daemon_fires_on_schedule(spark, tmp_path):
    """O3: the scheduler loop fires exactly at configured times, once
    per time slot (injectable clock/sleeper — no real sleeping)."""
    from ark_invest_api_rust_data_spark.pipeline import run_daemon

    runs = []

    def fetch(url):
        runs.append(url)
        return ARK_CSV

    ticks = iter(["09:59", "10:00", "10:00", "13:37", "22:00", "23:00"])
    run_daemon(
        spark,
        root=str(tmp_path),
        fetcher=fetch,
        clock=lambda: next(ticks),
        sleeper=lambda s: None,
        max_cycles=6,
    )
    # 8 scheduled tickers × 2 firings (10:00 fired once despite two ticks)
    assert len(runs) == 16


def test_lake_compaction_reduces_files(spark, tmp_path):
    """Roadmap #4: repeated incremental merges leave small files; the
    compaction pass rewrites partitions to one file each with no data
    change."""
    import glob

    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        compact_lake,
        read_lake,
        write_lake,
    )

    root = str(tmp_path)
    df = normalize(csv_to_df(spark, ARK_CSV))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # simulate 3 merge rounds appending to the same partitions
    write_lake(df, root)
    write_lake(df.repartition(4), root, mode="append")
    write_lake(df.repartition(4), root, mode="append")
    before = len(glob.glob(f"{root}/holdings/*/*/*.parquet"))
    rows_before = sorted(map(tuple, read_lake(spark, root).collect()))

    after = compact_lake(spark, root)
    assert after < before
    rows_after = sorted(map(tuple, read_lake(spark, root).collect()))
    assert rows_after == rows_before

    # compacted files are cusip-sorted WITHIN each file (row-group
    # min/max pruning + compression; SCALE.md finding 4)
    import pyarrow.parquet as pq

    for f in glob.glob(f"{root}/holdings/*/*/*.parquet"):
        cusips = pq.read_table(f, columns=["cusip"])["cusip"].to_pylist()
        assert cusips == sorted(cusips), f


def test_holdings_http_datasource(spark, tmp_path):
    """S3/S6 as a Spark 4 Python Data Source: per-ticker InputPartition
    fan-out, provider-agnostic (ticker, row_idx, fields-map) rows,
    recorded-fixture mode (no network)."""
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.sources.http_source import HoldingsDataSource

    for t in ("ARKK", "ARKW"):
        (tmp_path / f"{t}.csv").write_text(ARK_CSV)
    spark.dataSource.register(HoldingsDataSource)
    df = (
        spark.read.format("ark_holdings")
        .option("tickers", "ARKK,ARKW")
        .option("fixture_dir", str(tmp_path))
        .load()
    )
    rows = df.collect()
    # 14 data rows per fixture x 2 tickers; one partition per ticker
    assert len(rows) == 28
    assert df.rdd.getNumPartitions() == 2
    assert {r["ticker"] for r in rows} == {"ARKK", "ARKW"}
    first = df.filter((F.col("ticker") == "ARKK") & (F.col("row_idx") == 0)).first()
    assert first["fields"]["company"] == "TESLA INC"
    assert first["fields"]["market value ($)"] == "$1,234,567.89"
    # parse order preserved within a partition (row_idx contract)
    arkk = df.filter(F.col("ticker") == "ARKK").orderBy("row_idx").collect()
    assert [r["row_idx"] for r in arkk] == list(range(14))


def test_observe_quality_counters_ride_the_write(spark, tmp_path):
    """Observation metrics accumulate on the existing action (no extra
    scan): normalize the ARK fixture, write it, read the counters."""
    from ark_invest_api_rust_data_spark.functions.observability import observe_quality
    from ark_invest_api_rust_data_spark.operators.normalize import normalize

    raw = csv_to_df(spark, ARK_CSV)
    bad = raw.limit(1).withColumn("date", F.lit("not/a/date"))
    frame = normalize(raw.unionByName(bad))
    observed, obs = observe_quality(frame)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    # the unparseable date row is dropped by the null-date filter (P4),
    # so the observed frame counts only clean rows with zero nulls
    assert got["rows"] == 14
    assert got["null_dates"] == 0
    assert got["unidentified_rows"] == 0
    assert got["negative_market_values"] == 0
    assert got["max_weight"] > 0


def test_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    """PERMISSIVE CSV scan with corrupt-record quarantine: schema
    violations are captured with their raw text, clean rows parse
    fully, nothing is silently dropped."""
    from ark_invest_api_rust_data_spark.sources.data_reader import (
        csv_scan_with_quarantine,
    )

    p = tmp_path / "dirty.csv"
    p.write_text(
        "date,shares,weight\n"
        "2024-01-02,100,9.5\n"
        "2024-01-03,not_a_number,extra,columns,here\n"
        "2024-01-04,200,1.25\n"
    )
    good, bad = csv_scan_with_quarantine(
        spark, str(p), "date DATE, shares LONG, weight DOUBLE"
    )
    assert good.count() == 2
    assert {r["shares"] for r in good.collect()} == {100, 200}
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert len(quarantined) == 1 and "not_a_number" in quarantined[0]


def test_refresh_ticker_quality_metrics(spark, tmp_path):
    """quality_metrics rides the cache write: counters filled with no
    extra action."""
    metrics = {}
    refresh_ticker(
        spark,
        Ticker.ARKK,
        source=Source.ARK,
        root=str(tmp_path / "lake"),
        fetcher=lambda url: ARK_CSV,
        quality_metrics=metrics,
    )
    assert metrics["rows"] == 14
    assert metrics["null_dates"] == 0
    assert metrics["unidentified_rows"] == 0


def test_lake_concurrent_compaction_and_ingest_chaos(spark, tmp_path):
    """VERDICT r3 #5: a compactor and an ingest loop over the SAME
    holdings prefix never lose or duplicate rows. Ingest commits
    through write_lake_committed (lock + manifest bump); compact_lake
    swaps optimistically and retries when a batch landed mid-rewrite.
    Every ingested row must be present exactly once at the end."""
    import threading

    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        compact_lake,
        read_lake,
        read_lake_version,
        write_lake,
        write_lake_committed,
    )

    root = str(tmp_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def batch(i):
        # disjoint (ticker, date) partitions per batch -> the final lake
        # must contain the union of all batches exactly once
        rows = [(f"T{i}", f"2024-01-{d + 1:02d}", f"C{i}_{d}_{j}", float(j))
                for d in range(3) for j in range(20)]
        return (
            spark.createDataFrame(rows, "ticker string, date string, cusip string, weight double")
            .withColumn("date", F.to_date("date"))
            .repartition(4)  # several small files per partition
        )

    write_lake(batch(0), root)  # seed (pre-protocol lake: version 0)
    n_batches = 7
    errors = []

    def ingest_loop():
        try:
            for i in range(1, n_batches):
                write_lake_committed(batch(i), root)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    t = threading.Thread(target=ingest_loop)
    t.start()
    compactions = 0
    while t.is_alive():
        compact_lake(spark, root, attempts=20)
        compactions += 1
    t.join()
    compact_lake(spark, root, attempts=20)  # final fold, no contention
    assert not errors, errors
    assert compactions >= 1
    assert read_lake_version(root) >= n_batches - 1  # every commit bumped

    got = read_lake(spark, root).collect()
    keys = sorted((r["ticker"], str(r["date"]), r["cusip"]) for r in got)
    assert len(keys) == len(set(keys)), "duplicated rows after chaos"
    assert len(keys) == n_batches * 3 * 20, (
        f"lost rows: {len(keys)} != {n_batches * 3 * 20}"
    )


def test_lake_time_travel_and_reader_snapshot_isolation(spark, tmp_path):
    """Compaction commits a NEW generation dir and retires the old one
    untouched: a reader that resolved its file set before the commit
    keeps a consistent snapshot, and read_lake(version=) time-travels
    until vacuum."""
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        compact_lake,
        read_lake,
        read_lake_version,
        vacuum_lake,
        write_lake_committed,
    )

    root = str(tmp_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def frame(tick, n):
        rows = [(tick, "2024-02-01", f"{tick}_{j}", float(j)) for j in range(n)]
        return (
            spark.createDataFrame(
                rows, "ticker string, date string, cusip string, weight double"
            ).withColumn("date", F.to_date("date"))
        )

    v1 = write_lake_committed(frame("A", 5), root)
    assert v1 == 1
    pinned = read_lake(spark, root)  # resolves the v1 generation dir

    compact_lake(spark, root)  # -> generation holdings@v2, retires v1 dir
    write_lake_committed(frame("B", 7), root)  # v3, same generation

    # pinned pre-compaction reader still sees its consistent snapshot
    assert sorted(r["cusip"] for r in pinned.collect()) == [
        f"A_{j}" for j in range(5)
    ]
    # explicit time travel to v1; HEAD sees both batches
    assert read_lake(spark, root, version=1).count() == 5
    head = read_lake(spark, root)
    assert head.count() == 12
    assert read_lake_version(root) == 3

    # vacuum keeps the current generation, reclaims the v1 dir
    deleted = vacuum_lake(root, keep=1)
    assert deleted and deleted[0].endswith("/holdings")
    assert read_lake(spark, root).count() == 12  # HEAD unaffected
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_lake(spark, root, version=1).count()
    with _pytest.raises(ValueError):
        read_lake(spark, root, version=99)


def test_lake_vacuum_keeps_n_generations(spark, tmp_path):
    import pyspark.sql.functions as F

    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        compact_lake,
        read_lake,
        vacuum_lake,
        write_lake_committed,
    )

    root = str(tmp_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = (
        spark.createDataFrame(
            [("A", "2024-02-01", "c1", 1.0)],
            "ticker string, date string, cusip string, weight double",
        ).withColumn("date", F.to_date("date"))
    )
    write_lake_committed(df, root)        # v1 in holdings
    g2 = compact_lake(spark, root)        # v2 -> holdings@v2
    write_lake_committed(df, root)        # v3 (rewrites same partition)
    compact_lake(spark, root)             # v4 -> holdings@v4
    assert g2 >= 1
    # keep=2: holdings@v2 + holdings@v4 survive, original holdings goes
    deleted = vacuum_lake(root, keep=2)
    assert [d.rsplit("/", 1)[1] for d in deleted] == ["holdings"]
    assert read_lake(spark, root, version=2).count() == 1  # retained gen
    assert read_lake(spark, root).count() == 1
    # a second vacuum is a no-op (idempotent)
    assert vacuum_lake(root, keep=2) == []


def test_lake_diff_versions_cdc(spark, tmp_path):
    """diff_lake_versions: the row-level CDC between a retired
    generation and HEAD — appended rows surface as inserts, a
    partition overwrite as delete+insert pairs, and an empty diff when
    nothing changed."""
    from ark_invest_api_rust_data_spark.sources.parquet_store import (
        compact_lake,
        diff_lake_versions,
        read_lake_version,
        write_lake,
        write_lake_committed,
    )

    root = str(tmp_path)
    df = normalize(csv_to_df(spark, ARK_CSV))
    write_lake_committed(df, root)
    v1 = read_lake_version(root)
    compact_lake(spark, root)  # retires generation v1, keeps it on disk

    # nothing changed yet: empty diff across the compaction
    assert diff_lake_versions(spark, root, v_from=v1).count() == 0

    # append a modified copy of one row into HEAD's generation
    extra = df.limit(1).withColumn("shares", F.col("shares") + F.lit(7))
    write_lake_committed(extra, root, mode="append")

    delta = diff_lake_versions(spark, root, v_from=v1)
    rows = delta.collect()
    assert {r["op"] for r in rows} == {"insert"}
    assert len(rows) == 1 and rows[0]["shares"] == df.first()["shares"] + 7

    # overwrite the touched partition with changed shares: the pinned
    # generation still has the old rows -> delete+insert pairs
    part = df.limit(1).withColumn("shares", F.col("shares") * 2)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    write_lake(part, root)  # dynamic overwrite of that (ticker, date)
    delta2 = diff_lake_versions(spark, root, v_from=v1)
    ops = sorted(r["op"] for r in delta2.collect())
    assert "delete" in ops and "insert" in ops
