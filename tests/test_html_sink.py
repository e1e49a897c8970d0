"""S6: the -downloadJustHtmlFiles mode as a pages_html table
(ConnSupportUtils.java:994-1079; HtmlFileUtils.java:22-33; toggle
ArgsUtils.java:35): every visited page's html is persisted as
(url, final_url, md5, size) per round."""

from __future__ import annotations

import hashlib

from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


def test_pages_html_sink_records_every_visited_page(spark):
    web = SyntheticWeb(seed=42, n_hosts=6, pages_per_host_max=8)
    engine = CrawlEngine(spark, web, num_buckets=4, store_html=True)
    state = engine.crawl(web.seeds_df(spark), max_rounds=2)
    rows = {r["final_url"]: (r["html_hash"], r["html_size"])
            for r in state.pages_html.collect()}
    assert rows, "no pages recorded"
    for final_url, (h, size) in rows.items():
        body = web.responses[final_url]["html_body"]
        assert h == hashlib.md5(body.encode()).hexdigest()
        assert size == len(body)
    # every successfully visited html page of the crawl is in the sink
    visited_pages = {
        u for u, r in web.responses.items()
        if r.get("html_body") and r["status"] == 200
    }
    assert set(rows) <= visited_pages


def test_sink_off_by_default(spark):
    web = SyntheticWeb(seed=42, n_hosts=3, pages_per_host_max=4)
    state = CrawlEngine(spark, web, num_buckets=4).crawl(
        web.seeds_df(spark), max_rounds=1
    )
    assert state.pages_html is None
