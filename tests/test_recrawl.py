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


def _reval_frames(spark):
    prior = spark.createDataFrame(
        [
            # url_id, payload_hash, etag, last_modified, fetched_at_ms
            (1, "h1", '"e1"', "lm1", 1000),
            (2, "h2", '"e2"', None, 2000),
            (3, "h3", None, "lm3", 3000),
            (4, "h4", '"e4"', "lm4", 4000),
            (5, "h5", '"e5"', "lm5", 5000),
        ],
        "url_id long, payload_hash string, etag string, "
        "last_modified string, fetched_at_ms long",
    )
    fetched = spark.createDataFrame(
        [
            # 304: keep payload, refresh ts, coalesce validators
            (2, 304, None, '"e2b"', None, 2500),
            # 2xx changed payload
            (3, 200, "h3-new", '"e3"', "lm3b", 3500),
            # 2xx equal payload (origin ignored validators)
            (4, 200, "h4", None, None, 4500),
            # error: stored state untouched
            (5, 503, None, None, None, 5500),
        ],
        "url_id long, status int, payload_hash string, etag string, "
        "last_modified string, fetched_at_ms long",
    )
    return prior, fetched


def test_apply_revalidation_case_table(spark):
    from publicationsretriever_spark.operators.recrawl import (
        apply_revalidation,
    )

    prior, fetched = _reval_frames(spark)
    out = {r["url_id"]: r.asDict()
           for r in apply_revalidation(prior, fetched).collect()}
    assert out[1] == {"url_id": 1, "action": "kept",
                      "payload_hash": "h1", "etag": '"e1"',
                      "last_modified": "lm1", "fetched_at_ms": 1000,
                      "attempt_at_ms": None, "outcome": None}
    assert out[2] == {"url_id": 2, "action": "revalidated",
                      "payload_hash": "h2", "etag": '"e2b"',
                      "last_modified": None, "fetched_at_ms": 2500,
                      "attempt_at_ms": 2500, "outcome": "unchanged"}
    assert out[3] == {"url_id": 3, "action": "replaced",
                      "payload_hash": "h3-new", "etag": '"e3"',
                      "last_modified": "lm3b", "fetched_at_ms": 3500,
                      "attempt_at_ms": 3500, "outcome": "changed"}
    assert out[4] == {"url_id": 4, "action": "replaced",
                      "payload_hash": "h4", "etag": None,
                      "last_modified": None, "fetched_at_ms": 4500,
                      "attempt_at_ms": 4500, "outcome": "unchanged"}
    # error: STATE clock pinned at 5000, ATTEMPT clock says 5500
    assert out[5] == {"url_id": 5, "action": "error",
                      "payload_hash": "h5", "etag": '"e5"',
                      "last_modified": "lm5", "fetched_at_ms": 5000,
                      "attempt_at_ms": 5500, "outcome": "error"}


def test_revalidation_feeds_recrawl_schedule(spark):
    """The composition contract: the merge's (id, ts, outcome) rows
    append to the history recrawl_schedule consumes — an unchanged
    streak stretches the delay, an error streak backs off."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.recrawl import (
        apply_revalidation,
        recrawl_schedule,
    )

    prior, fetched = _reval_frames(spark)
    merged = apply_revalidation(prior, fetched)
    # history feed uses the ATTEMPT clock — the state clock would pin
    # erroring URLs at their last success and zero the fail streak
    hist = (
        merged.filter(F.col("outcome").isNotNull())
        .select(
            "url_id",
            F.timestamp_millis(F.col("attempt_at_ms")).alias("ts"),
            "outcome",
        )
    )
    sched = {r["url_id"]: r for r in
             recrawl_schedule(hist, base_delay_s=60).collect()}
    assert set(sched) == {2, 3, 4, 5}
    # changed page stays at base; unchanged page doubles (1+1)//1
    assert sched[3]["delay_s"] == 60
    assert sched[2]["delay_s"] == 120
    # error: fail_streak 1 -> (base*2) <<1 = 240? no prior ok fetch:
    # staleness (1+0)//(1+0)=1 -> 60 << 1 = 120
    assert sched[5]["fail_streak"] == 1
    assert sched[5]["delay_s"] == 120


def test_error_after_success_backs_off_from_attempt_time(spark):
    """The reviewer scenario the attempt clock exists for: success at
    t=1.0s then a 503 attempt at t=1.5s. With the attempt clock the
    error row is ts=1500 > _ok_max=1000, so fail_streak=1, the
    backoff doubles the delay, and next_fetch_ts advances from the
    ATTEMPT — the erroring URL is never hammered every round."""
    import datetime

    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.recrawl import (
        apply_revalidation,
        recrawl_schedule,
    )

    prior = spark.createDataFrame(
        [(9, "h9", None, None, 1000)],
        "url_id long, payload_hash string, etag string, "
        "last_modified string, fetched_at_ms long",
    )
    fetched = spark.createDataFrame(
        [(9, 503, None, None, None, 1500)],
        "url_id long, status int, payload_hash string, etag string, "
        "last_modified string, fetched_at_ms long",
    )
    merged = apply_revalidation(prior, fetched)
    row = merged.collect()[0]
    assert row["fetched_at_ms"] == 1000  # state clock pinned
    assert row["attempt_at_ms"] == 1500  # attempt clock advanced
    hist = spark.createDataFrame(
        [(9, datetime.datetime(1970, 1, 1, 0, 0, 1), "changed")],
        "url_id long, ts timestamp, outcome string",
    ).unionByName(
        merged.select(
            "url_id",
            F.timestamp_millis(F.col("attempt_at_ms")).alias("ts"),
            "outcome",
        )
    )
    s = recrawl_schedule(hist, base_delay_s=60).collect()[0]
    assert s["fail_streak"] == 1
    # stale = 60*(1+0)//(1+1) = 30, <<1 = 60, clamped to base 60 —
    # the backoff DID fire (without it stale alone would be 30)
    assert s["delay_s"] == 60
    assert s["last_ts"] == datetime.datetime(1970, 1, 1, 0, 0, 1, 500000)
