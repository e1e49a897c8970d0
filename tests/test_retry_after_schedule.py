"""Retry-After honoring in the politeness schedule (beyond-reference:
the reference only logs the header, ConnSupportUtils.java:675-680).
When a host's response carries retry_after_ms, the host's NEXT slot is
max(politeness delay, server backoff) after the current one."""

from __future__ import annotations

from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


def test_retry_after_stretches_host_slots(spark):
    web = SyntheticWeb(seed=42, n_hosts=1, pages_per_host_max=4)
    # every known response demands a 10s backoff; all round-0 seeds of
    # the single host then space 10000ms apart instead of 3000ms
    for resp in web.responses.values():
        resp["retry_after_ms"] = 10_000
    engine = CrawlEngine(
        spark, web, num_buckets=4, host_quota=50, record_order=True
    )
    state = engine.crawl(web.seeds_df(spark), max_rounds=1)
    rows = sorted(
        (
            (r["host"], r["url_hash"], r["planned_fetch_ms"])
            for r in state.order_log.collect()
        ),
    )
    assert rows, "no fetches logged"
    # one host; slots ascend 0, 10000, 20000, ... in url_hash order
    slots = [r[2] for r in rows]
    assert slots == [i * 10_000 for i in range(len(slots))], slots


def test_no_retry_after_keeps_plain_politeness(spark):
    web = SyntheticWeb(seed=42, n_hosts=1, pages_per_host_max=4)
    engine = CrawlEngine(
        spark, web, num_buckets=4, host_quota=50, record_order=True
    )
    state = engine.crawl(web.seeds_df(spark), max_rounds=1)
    slots = [
        r["planned_fetch_ms"]
        for r in sorted(
            state.order_log.collect(), key=lambda r: (r["host"], r["url_hash"])
        )
    ]
    assert slots == [i * 3_000 for i in range(len(slots))], slots
