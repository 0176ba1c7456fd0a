"""Message-bus source/sink (sources/msgbus.py): Kafka-shape offset
semantics — contiguous per-partition offsets, offset-range
micro-batches, exactly-once replay from a checkpoint, admission
control, torn-tail tolerance — all on the file-backed log, no broker
daemon."""

from __future__ import annotations

import json
import os
import time

import pytest

from ark_invest_api_rust_data_spark.sources.msgbus import (
    MsgBusDataSource,
    MsgBusProducer,
    read_range,
    topic_ends,
)


@pytest.fixture
def bus(tmp_path):
    return str(tmp_path / "bus")


def _produce(bus, topic="t", n=20, nparts=3, segment_records=6):
    prod = MsgBusProducer(bus, topic, n_partitions=nparts, segment_records=segment_records)
    for i in range(n):
        prod.send(f"v{i}", key=f"k{i % 5}", ts_us=1_700_000_000_000_000 + i)
    return prod


def test_producer_offsets_contiguous_and_keyed(bus):
    prod = _produce(bus, n=30)
    ends = topic_ends(bus, "t")
    assert sorted(ends) == [0, 1, 2]
    assert sum(ends.values()) == 30
    # same key → same partition (CRC32 partitioner is deterministic)
    p1 = prod.partition_for("k1")
    assert all(prod.partition_for("k1") == p1 for _ in range(5))
    # each partition's log is offset-contiguous from 0
    for p, end in ends.items():
        rows = list(read_range(bus, "t", p, 0, end))
        assert [r[2] for r in rows] == list(range(end))


def test_segment_roll_and_mid_log_start(bus):
    _produce(bus, n=20, nparts=1, segment_records=6)
    part_dir = os.path.join(bus, "t", "p0")
    segs = sorted(f for f in os.listdir(part_dir) if f.endswith(".seg"))
    assert len(segs) == 4  # 6+6+6+2
    # a mid-log read starts at the right segment and honors [start, end)
    rows = list(read_range(bus, "t", 0, 7, 14))
    assert [r[2] for r in rows] == list(range(7, 14))


def test_torn_tail_line_ignored(bus):
    prod = _produce(bus, n=5, nparts=1)
    part_dir = os.path.join(bus, "t", "p0")
    seg = sorted(os.listdir(part_dir))[-1]
    with open(os.path.join(part_dir, seg), "a", encoding="utf-8") as f:
        f.write('{"offset": 5, "val')  # crashed producer mid-record
    assert topic_ends(bus, "t") == {0: 5}
    assert len(list(read_range(bus, "t", 0, 0, 5))) == 5
    # a recovering producer overwrites the torn tail's offset slot
    prod2 = MsgBusProducer(bus, "t", n_partitions=1)
    prod2.send("v5")
    assert [r[5] for r in read_range(bus, "t", 0, 5, 6)] == ["v5"]


def test_offset_gap_fails_loudly(bus):
    prod = _produce(bus, n=3, nparts=1)
    part_dir = os.path.join(bus, "t", "p0")
    seg = sorted(os.listdir(part_dir))[-1]
    with open(os.path.join(part_dir, seg), "a", encoding="utf-8") as f:
        f.write(json.dumps({"offset": 7, "value": "skipped"}) + "\n")
    with pytest.raises(Exception, match="offset gap"):
        list(read_range(bus, "t", 0, 0, 8))


def test_batch_read_full_log(spark, bus):
    _produce(bus, n=24, nparts=3)
    spark.dataSource.register(MsgBusDataSource)
    df = spark.read.format("msgbus").option("path", bus).option("topic", "t").load()
    rows = df.collect()
    assert len(rows) == 24
    assert {r["partition"] for r in rows} == {0, 1, 2}
    vals = {r["value"] for r in rows}
    assert vals == {f"v{i}" for i in range(24)}
    # ts round-trips at microsecond precision
    got = {r["value"]: r["ts"] for r in rows}
    assert got["v3"].microsecond == 3
    # one Spark task per bus partition
    assert df.rdd.getNumPartitions() == 3


def test_batch_read_offset_range(spark, bus):
    _produce(bus, n=24, nparts=3)
    spark.dataSource.register(MsgBusDataSource)
    ends = topic_ends(bus, "t")
    start = {str(p): 1 for p in ends}
    df = (
        spark.read.format("msgbus")
        .option("path", bus)
        .option("topic", "t")
        .option("startingOffsets", json.dumps(start))
        .load()
    )
    assert df.count() == 24 - 3
    assert df.where("offset = 0").count() == 0


def test_batch_write_then_read(spark, bus):
    spark.dataSource.register(MsgBusDataSource)
    src = spark.createDataFrame(
        [(f"k{i}", f"payload-{i}", i % 2) for i in range(10)],
        "key string, value string, partition int",
    )
    (
        src.write.format("msgbus")
        .option("path", bus)
        .option("topic", "w")
        .option("npartitions", "2")
        .mode("append")
        .save()
    )
    back = (
        spark.read.format("msgbus")
        .option("path", bus).option("topic", "w").load().collect()
    )
    assert {r["value"] for r in back} == {f"payload-{i}" for i in range(10)}
    assert {r["partition"] for r in back} == {0, 1}


def _run_stream(spark, bus, ckpt, out_path, max_per_batch=None):
    reader = (
        spark.readStream.format("msgbus")
        .option("path", bus)
        .option("topic", "t")
    )
    if max_per_batch:
        reader = reader.option("maxRecordsPerBatch", str(max_per_batch))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_exactly_once_across_restart(spark, bus, tmp_path):
    """Offset-range replay: rows written before a restart are not
    re-emitted after it; rows appended between runs are picked up."""
    spark.dataSource.register(MsgBusDataSource)
    _produce(bus, n=12, nparts=3)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _run_stream(spark, bus, ckpt, out)
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 12
    # append more, restart from the same checkpoint
    prod = MsgBusProducer(bus, "t", n_partitions=3)
    for i in range(12, 18):
        prod.send(f"v{i}", key=f"k{i % 5}")
    _run_stream(spark, bus, ckpt, out)
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == 18  # no duplicates, no loss
    assert {r["value"] for r in got2} == {f"v{i}" for i in range(18)}


def test_stream_admission_control(spark, bus, tmp_path):
    """maxRecordsPerBatch clamps the COMMITTED offset (not just the
    read ranges — that would silently skip the difference): each
    availableNow run admits ≤ cap, and repeated runs drain the log
    with no loss and no duplicates."""
    spark.dataSource.register(MsgBusDataSource)
    _produce(bus, n=30, nparts=3)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    counts = []
    for _ in range(12):
        _run_stream(spark, bus, ckpt, out, max_per_batch=9)
        n = spark.read.parquet(out).count()
        counts.append(n)
        if n == 30:
            break
    assert counts[-1] == 30, counts
    # each availableNow run admitted at most the cap per micro-batch;
    # 30 records at a 9-cap needs ≥ 4 admission rounds
    steps = [b - a for a, b in zip([0] + counts, counts)]
    assert all(s <= 9 for s in steps), steps
    assert len(counts) >= 4, counts
    # no duplicates: every (partition, offset) pair is unique
    rows = spark.read.parquet(out).select("partition", "offset").collect()
    assert len({(r[0], r[1]) for r in rows}) == 30


def test_stream_starting_latest_skips_backlog(spark, bus, tmp_path):
    spark.dataSource.register(MsgBusDataSource)
    _produce(bus, n=9, nparts=3)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    reader = (
        spark.readStream.format("msgbus")
        .option("path", bus).option("topic", "t")
        .option("startingOffsets", "latest")
    )
    q = (
        reader.load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")] if os.path.isdir(out) else []
    n = spark.read.parquet(out).count() if files else 0
    assert n == 0
