"""robots.txt parsing goldens (RFC 9309 semantics) + the Spark adapter."""

from __future__ import annotations

import pytest

from publicationsretriever_spark.functions.robots import (
    parse_robots,
    robots_rules_df,
)

pytestmark = pytest.mark.usefixtures("spark")

BODY = """# global comment
Sitemap: https://ex.org/sitemap.xml

User-agent: GoodBot
User-agent: OtherBot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/
Disallow:
Crawl-delay: 10

User-agent: GoodBot
Disallow: /extra/

Sitemap: https://ex.org/sitemap-news.xml
"""


def test_exact_agent_union_beats_star():
    r = parse_robots(BODY, "goodbot")
    assert r["disallow"] == ["/private/", "/extra/"]  # both exact groups
    assert r["allow"] == ["/private/ok"]
    assert r["crawl_delay"] == 2.5
    assert r["sitemaps"] == [
        "https://ex.org/sitemap.xml",
        "https://ex.org/sitemap-news.xml",
    ]


def test_star_fallback_and_empty_disallow_noop():
    r = parse_robots(BODY, "unknownbot")
    assert r["disallow"] == ["/tmp/"]  # empty Disallow recorded nowhere
    assert r["crawl_delay"] == 10.0


def test_shared_group_feeds_both_exact_and_star():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    assert parse_robots(body, "a")["disallow"] == ["/x/"]
    assert parse_robots(body, "b")["disallow"] == ["/x/"]


def test_ua_after_rules_starts_new_group():
    body = (
        "User-agent: a\nDisallow: /a/\n"
        "User-agent: b\nDisallow: /b/\n"
    )
    assert parse_robots(body, "a")["disallow"] == ["/a/"]
    assert parse_robots(body, "b")["disallow"] == ["/b/"]


def test_lenient_on_garbage_and_empty():
    assert parse_robots(None)["disallow"] == []
    assert parse_robots("")["disallow"] == []
    r = parse_robots(
        "nonsense line\nDisallow /noseparator\nCrawl-delay: soon\n"
        "User-agent: *\nCrawl-delay: nan-ish\nDisallow: /d/\n", "x"
    )
    assert r["disallow"] == ["/d/"] and r["crawl_delay"] is None


def test_rules_before_any_group_are_ignored():
    assert parse_robots("Disallow: /early/\nUser-agent: *\nDisallow: /x/\n")[
        "disallow"
    ] == ["/x/"]


def test_spark_adapter_matches_plain_python(spark):
    rows = [("ex.org", BODY), ("empty.org", ""), ("none.org", None)]
    df = spark.createDataFrame(rows, "domain string, body string")
    got = {
        r["domain"]: (
            list(r["disallow"]), list(r["allow"]),
            r["crawl_delay"], list(r["sitemaps"]),
        )
        for r in robots_rules_df(df, agent="GoodBot").collect()
    }
    for dom, body in rows:
        p = parse_robots(body, "GoodBot")
        assert got[dom] == (
            p["disallow"], p["allow"], p["crawl_delay"], p["sitemaps"]
        ), dom


def test_crawl_delay_overrides_politeness_clock(spark):
    """A robots table carrying crawl_delay spaces a host's planned
    fetch slots by its own delay; hosts without one keep the
    reference's POLITENESS_MS. Absent column = reference behavior
    (covered by the whole conformance suite)."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.plans.rounds import (
        POLITENESS_MS,
        CrawlEngine,
    )
    from publicationsretriever_spark.sources.synthetic_web import (
        SyntheticWeb,
    )

    web = SyntheticWeb(seed=11, n_hosts=4, pages_per_host_max=8)
    base = web.robots_df(spark)
    hosts = sorted(r["domain"] for r in base.select("domain").collect())
    slow = hosts[0]
    rob = base.withColumn(
        "crawl_delay",
        F.when(F.col("domain") == slow, F.lit(9.0)).otherwise(
            F.lit(None).cast("double")
        ),
    )
    state = CrawlEngine(
        spark, web, num_buckets=4, host_quota=8,
        record_order=True, robots_df=rob,
    ).crawl(web.seeds_df(spark), max_rounds=3)
    rows = state.order_log.collect()
    per = {}
    for r in rows:
        per.setdefault((r["round"], r["host"]), []).append(
            r["planned_fetch_ms"]
        )
    deltas = {}
    for (rnd, host), slots in per.items():
        slots = sorted(slots)
        for a, b in zip(slots, slots[1:]):
            deltas.setdefault(host, set()).add(b - a)
    assert slow in deltas, "need >=2 same-round fetches on the slow host"
    assert deltas[slow] == {9000}
    others = set().union(*(v for h, v in deltas.items() if h != slow))
    assert others == {POLITENESS_MS}


def test_allow_carveout_longest_match_precedence(spark):
    """RFC 9309 §2.2.2 in the engine gate: 'Disallow: /article' +
    'Allow: /article/1' blocks every article EXCEPT the /article/1
    carve-out (longest matching rule wins). Hosts without an allow
    array keep the original disallow-prefix behavior."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.plans.rounds import CrawlEngine
    from publicationsretriever_spark.sources.synthetic_web import (
        SyntheticWeb,
    )

    web = SyntheticWeb(seed=5, n_hosts=3, pages_per_host_max=6)
    hosts = sorted(web.robots.keys())
    carved = hosts[0]
    rob = spark.createDataFrame(
        [
            (carved, ["/article"], ["/article/1"]),
            (hosts[1], ["/article"], None),  # no carve-out: all blocked
        ],
        "domain string, disallow array<string>, allow array<string>",
    )
    state = CrawlEngine(
        spark, web, num_buckets=4, host_quota=16, robots_df=rob,
    ).crawl(web.seeds_df(spark), max_rounds=2)
    res = state.results.filter(
        F.col("error") == "robots disallowed"
    ).select("sourceUrl").collect()
    blocked = {r["sourceUrl"] for r in res}
    # the carve-out article was never robots-blocked...
    assert not any(
        carved in u and "/article/1" in u for u in blocked
    ), blocked
    # ...but sibling articles of the SAME host were
    assert any(
        carved in u and "/article/" in u and "/article/1" not in u
        for u in blocked
    ), blocked
    # and the no-allow host blocks /article/1 like everything else
    assert any(hosts[1] in u and "/article/1" in u for u in blocked) or \
        not any(hosts[1] in u and "/article/" in u
                for u in {r for r in blocked})  # host may have <2 articles
    # fetched set confirms the carve-out was actually crawled
    fetched = {
        r["sourceUrl"]
        for r in state.results.filter(
            F.col("error") != "robots disallowed"
        ).select("sourceUrl").collect()
    }
    assert any(carved in u and "/article/1" in u for u in fetched)


def test_wildcard_and_anchor_rules_in_gate(spark):
    """RFC 9309 §2.2.3: '*' and a trailing '$' in rules MUST be
    supported. '/article/1$' blocks exactly /article/1 (not
    /article/10, /article/11); '/article/*0' blocks the articles
    whose path contains a 0 after the prefix. Plain rules keep the
    prefix path."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.plans.rounds import CrawlEngine
    from publicationsretriever_spark.sources.synthetic_web import (
        SyntheticWeb,
    )

    web = SyntheticWeb(seed=5, n_hosts=2, pages_per_host_max=12)
    host0 = sorted(web.robots.keys())[0]  # 12 articles: /article/0..11
    rob = spark.createDataFrame(
        [(host0, ["/article/1$", "/article/*0"], None)],
        "domain string, disallow array<string>, allow array<string>",
    )
    state = CrawlEngine(
        spark, web, num_buckets=4, host_quota=32, robots_df=rob,
    ).crawl(web.seeds_df(spark), max_rounds=2)
    blocked = {
        r["sourceUrl"]
        for r in state.results.filter(
            F.col("error") == "robots disallowed"
        ).collect()
        if host0 in r["sourceUrl"]
    }
    import re

    blocked_ids = {
        m.group(1)
        for u in blocked
        for m in [re.search(r"/article/(\d+)", u)]
        if m
    }
    # $ anchor: exactly 1; wildcard: 0 and 10 (contain a 0 after
    # /article/); 11 must NOT be blocked
    assert "1" in blocked_ids
    assert "10" in blocked_ids and "0" in blocked_ids
    assert "11" not in blocked_ids, blocked_ids
    assert "2" not in blocked_ids
