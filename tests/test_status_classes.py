"""HTTP status classing (N1/N6): 2XX and 304 are SUCCESS, 3XX except
304 are redirects (HttpConnUtils.java:284-288,631) — a 201/204/206/304
or 300 response must never fall into the unknown_code branch, which
blacklists the whole domain (round-2 advice finding)."""

from __future__ import annotations

import pytest

from publicationsretriever_spark.crawl.oracle import (
    all_urls_of_web,
    compute_verdicts,
    crawl_oracle,
)
from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


@pytest.fixture(scope="module")
def status_setup(spark):
    web = SyntheticWeb(seed=3, n_hosts=3, pages_per_host_max=4)
    B = "https://host2.example2.org"

    def img(status, image_id):
        r = dict(web._image_response(image_id))
        r["status"] = status
        return r

    web.responses[f"{B}/doc-201"] = img(201, "st-201")
    web.responses[f"{B}/doc-204"] = img(204, "st-204")
    web.responses[f"{B}/doc-206"] = img(206, "st-206")
    web.responses[f"{B}/doc-304"] = img(304, "st-304")
    # 300 Multiple Choices WITH location: followed like any redirect
    web.responses[f"{B}/multi-300"] = {
        "status": 300, "location": f"{B}/doc-201", "content_type": None,
        "content_disposition": None, "content_length": 0,
        "body_kind": "redirect", "image_id": None, "html_links": [],
    }
    # 305 with NO location: classed redirect_limit, NOT unknown_code
    web.responses[f"{B}/use-proxy-305"] = {
        "status": 305, "location": None, "content_type": None,
        "content_disposition": None, "content_length": 0,
        "body_kind": "redirect", "image_id": None, "html_links": [],
    }
    web.seeds += [
        ("st::201", f"{B}/doc-201"),
        ("st::204", f"{B}/doc-204"),
        ("st::206", f"{B}/doc-206"),
        ("st::304", f"{B}/doc-304"),
        ("st::300", f"{B}/multi-300"),
        ("st::305", f"{B}/use-proxy-305"),
    ]
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(spark, web, num_buckets=4, host_quota=50)
    state = engine.crawl(web.seeds_df(spark), max_rounds=2)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(web, verdicts, seeds, max_rounds=2, host_quota=50)
    return web, state, oracle


def test_matches_oracle(status_setup):
    _web, state, oracle = status_setup
    engine_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in state.results.collect()
    )
    oracle_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in oracle.results
    )
    assert engine_rows == oracle_rows


def test_2xx_and_304_are_success_not_unknown_code(status_setup):
    _web, state, _oracle = status_setup
    rows = {r["id"]: r for r in state.results.collect()
            if r["id"].startswith("st::")}
    for sid in ("st::201", "st::204", "st::206", "st::304", "st::300"):
        assert rows[sid]["docOrDatasetUrl"] != "unreachable", (
            sid, rows[sid]["error"],
        )
    # the host must NOT have been domain-blacklisted by any of these
    blocked = {r["domain"] for r in state.blocked_domains.collect()}
    assert "host2.example2.org" not in blocked


def test_locationless_3xx_is_redirect_limit(status_setup):
    _web, state, _oracle = status_setup
    row = next(r for r in state.results.collect() if r["id"] == "st::305")
    assert row["docOrDatasetUrl"] == "unreachable"
    blocked = {r["domain"] for r in state.blocked_domains.collect()}
    assert "host2.example2.org" not in blocked
