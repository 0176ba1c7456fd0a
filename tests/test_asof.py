"""asof_join vs pandas.merge_asof — direction and tolerance semantics
(SURVEY §2 B6; pandas is the de-facto reference for merge_asof)."""

from __future__ import annotations

import pandas as pd
import pytest

from ark_invest_api_rust_data_spark.catalog import load_table
from ark_invest_api_rust_data_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def _pdf(spark):
    ev = load_table(spark, SF, "events").toPandas()
    purchases = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
    clicks = ev[ev.event_type == "click"][["user_id", "ts", "value"]].rename(
        columns={"value": "click_value"}
    )
    return purchases.sort_values("ts"), clicks.sort_values("ts")


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance_s", [None, 3600])
def test_asof_matches_pandas(spark, direction, tolerance_s):
    purchases_pd, clicks_pd = _pdf(spark)
    expected = pd.merge_asof(
        purchases_pd,
        clicks_pd,
        on="ts",
        by="user_id",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance_s) if tolerance_s else None,
    )

    ev = load_table(spark, SF, "events")
    purchases = ev.filter(ev.event_type == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(ev.event_type == "click").select(
        "user_id", "ts", ev.value.alias("click_value")
    )
    got = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        values=["click_value"],
        direction=direction,
        tolerance_seconds=tolerance_s,
    ).toPandas()

    exp = {
        (int(r.event_id), None if pd.isna(r.click_value) else round(float(r.click_value), 6))
        for r in expected.itertuples()
    }
    act = {
        (int(r.event_id), None if pd.isna(r.click_value) else round(float(r.click_value), 6))
        for r in got.itertuples()
    }
    assert act == exp


@pytest.mark.parametrize("tolerance_s", [None, 3600])
def test_asof_nearest_matches_pandas(spark, tolerance_s):
    """direction='nearest': closer of backward/forward, backward wins
    ties, tolerance masks each side before the choice — all per
    pandas.merge_asof semantics."""
    purchases_pd, clicks_pd = _pdf(spark)
    expected = pd.merge_asof(
        purchases_pd,
        clicks_pd,
        on="ts",
        by="user_id",
        direction="nearest",
        tolerance=pd.Timedelta(seconds=tolerance_s) if tolerance_s else None,
    )

    ev = load_table(spark, SF, "events")
    purchases = ev.filter(ev.event_type == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(ev.event_type == "click").select(
        "user_id", "ts", ev.value.alias("click_value")
    )
    got = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        values=["click_value"],
        direction="nearest",
        tolerance_seconds=tolerance_s,
    ).toPandas()

    exp = {
        (int(r.event_id), None if pd.isna(r.click_value) else round(float(r.click_value), 6))
        for r in expected.itertuples()
    }
    act = {
        (int(r.event_id), None if pd.isna(r.click_value) else round(float(r.click_value), 6))
        for r in got.itertuples()
    }
    assert act == exp
