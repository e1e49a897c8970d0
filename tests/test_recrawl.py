"""Recrawl scheduling: hand-computed semantics, edge cases, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.operators.recrawl import recrawl_schedule

pytestmark = pytest.mark.usefixtures("spark")

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def test_recrawl_hand_computed(spark):
    rows = [
        # url 1: changes every visit -> stays at base
        (1, _ts(0), "changed"),
        (1, _ts(1), "changed"),
        # url 2: never changes -> linear backoff (1+3)//(1+0) = 4x base
        (2, _ts(0), "unchanged"),
        (2, _ts(1), "unchanged"),
        (2, _ts(2), "unchanged"),
        # url 3: ok then two trailing errors -> streak 2 -> <<2
        (3, _ts(0), "changed"),
        (3, _ts(1), "error"),
        (3, _ts(2), "error"),
        # url 4: all errors -> streak = all 3 fetches
        (4, _ts(0), "error"),
        (4, _ts(1), "error"),
        (4, _ts(2), "error"),
    ]
    out = {
        r["url_id"]: r
        for r in recrawl_schedule(
            spark.createDataFrame(rows, ["url_id", "ts", "outcome"]),
            base_delay_s=3600,
            max_delay_s=30 * 86400,
        ).collect()
    }
    r1 = out[1]
    assert (r1["fail_streak"], r1["delay_s"]) == (0, 3600)
    # (1+0 unchanged)//(1+2 changed) = 0 -> clamped up to base
    assert r1["next_fetch_ts"] == _ts(1) + dt.timedelta(seconds=3600)
    r2 = out[2]
    assert (r2["fail_streak"], r2["delay_s"]) == (0, 4 * 3600)
    r3 = out[3]
    # stale = 3600*(1+0)//(1+1) = 1800, clamped to base 3600? no:
    # stale*backoff first: 1800 << 2 = 7200, then clamp -> 7200
    assert (r3["fail_streak"], r3["delay_s"]) == (2, 7200)
    r4 = out[4]
    # stale = 3600*1//1 = 3600; << 3 = 28800
    assert (r4["fail_streak"], r4["n_error"], r4["delay_s"]) == (
        3,
        3,
        28800,
    )
    assert r4["next_fetch_ts"] == _ts(2) + dt.timedelta(seconds=28800)


def test_recrawl_clamps_to_max_and_base(spark):
    rows = [(1, _ts(i), "error") for i in range(20)] + [
        (2, _ts(0), "changed")
    ]
    out = {
        r["url_id"]: r["delay_s"]
        for r in recrawl_schedule(
            spark.createDataFrame(rows, ["url_id", "ts", "outcome"]),
            base_delay_s=3600,
            max_delay_s=86400,
        ).collect()
    }
    assert out[1] == 86400  # 3600 << min(20,16) >> max -> clamp
    assert out[2] == 3600  # floor at base


def test_recrawl_single_shuffle(spark):
    """The window and the groupBy share the url_id hash partitioning:
    exactly ONE exchange in the plan."""
    df = spark.createDataFrame(
        [(1, _ts(0), "changed")], ["url_id", "ts", "outcome"]
    )
    plan = (
        recrawl_schedule(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_recrawl_single_fetch_histories(spark):
    rows = [(1, _ts(0), "changed"), (2, _ts(0), "error"),
            (3, _ts(0), "unchanged")]
    out = {
        r["url_id"]: (r["fail_streak"], r["delay_s"])
        for r in recrawl_schedule(
            spark.createDataFrame(rows, ["url_id", "ts", "outcome"]),
            base_delay_s=100, max_delay_s=10**6,
        ).collect()
    }
    assert out[1] == (0, 100)       # 100*1//2=50 -> clamp to base
    assert out[2] == (1, 200)       # 100*1//1=100, <<1
    assert out[3] == (0, 200)       # 100*2//1=200
