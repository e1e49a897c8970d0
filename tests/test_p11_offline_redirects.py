"""P11 conformance: offline https/slash redirect learning.

Round 0 pays the redirect hop and LEARNS the domain flag
(HttpConnUtils.java:613-623); round 1 applies the offline rewrite
before connecting (:326-334). The webs are built so the round-1 urls
have NO redirect entry at all — the doc result rows can only exist if
the offline rewrite actually fired (a 404 otherwise), and the
sequential oracle must reproduce the same learning to stay in parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.crawl.oracle import (
    all_urls_of_web,
    compute_verdicts,
    crawl_oracle,
)
from publicationsretriever_spark.plans.rounds import CrawlEngine

from test_blocking_conformance import ErrorWeb


class RedirectWeb(ErrorWeb):
    def _build(self):
        # legacy: http pages 301 -> https (learn https_ok round 0); the
        # pages link to http doc urls that ONLY exist under https
        for i in range(3):
            hu = f"http://legacy.example.org/a/{i}"
            su = f"https://legacy.example.org/a/{i}"
            self.responses[hu] = self._resp(301, location=su)
            doc_http = f"http://legacy.example.org/files/{i}/fulltext.pdf"
            body = f'<html><body><div><a href="{doc_http}">full text</a></div></body></html>'
            self.responses[su] = self._resp(
                200, content_type="text/html", content_length=len(body),
                body_kind="html", html_links=[doc_http], html_body=body,
            )
            self.responses[f"https://legacy.example.org/files/{i}/fulltext.pdf"] = (
                self._image(f"img-leg-{i}")
            )
            self._seed(f"leg::{i:03d}", hu)
        # slashy: /dir 301 -> /dir/ (learn slash_ok round 0); the page
        # links to /dir2 which ONLY exists as /dir2/
        u = "https://slashy.example.org/dir"
        body = '<html><body><div><a href="https://slashy.example.org/dir2">item</a></div></body></html>'
        self.responses[u] = self._resp(301, location=u + "/")
        self.responses[u + "/"] = self._resp(
            200, content_type="text/html", content_length=len(body),
            body_kind="html",
            html_links=["https://slashy.example.org/dir2"], html_body=body,
        )
        self.responses["https://slashy.example.org/dir2/"] = self._image("img-slash")
        self._seed("slash::000", u)


@pytest.fixture(scope="module")
def p11_setup(spark):
    web = RedirectWeb()
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(spark, web, num_buckets=4, host_quota=50)
    state = engine.crawl(web.seeds_df(spark), max_rounds=2)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(web, verdicts, seeds, max_rounds=2, host_quota=50)
    return state, oracle


def test_results_match_oracle(p11_setup):
    state, oracle = p11_setup
    engine_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in state.results.collect()
    )
    oracle_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in oracle.results
    )
    assert engine_rows == oracle_rows


def test_flags_learned(p11_setup):
    state, oracle = p11_setup
    flags = {r["domain"]: (r["https_ok"], r["slash_ok"])
             for r in state.domain_flags.collect()}
    assert flags.get("legacy.example.org", (False, False))[0] is True
    assert flags.get("slashy.example.org", (False, False))[1] is True
    assert "legacy.example.org" in oracle.https_domains
    assert "slashy.example.org" in oracle.slash_domains


def test_offline_rewrite_saves_the_hop(p11_setup):
    """The round-1 doc urls resolve ONLY under their rewritten form —
    the doc rows exist iff the offline redirect fired pre-fetch."""
    state, _oracle = p11_setup
    r1_docs = {
        r["sourceUrl"]: (r["docOrDatasetUrl"], r["wasDirectLink"])
        for r in state.results.filter(
            (F.col("round") == 1)
            & (~F.col("docOrDatasetUrl").isin("duplicate", "unreachable"))
        ).collect()
    }
    # https rewrite: final differs from the link only by protocol -> direct
    doc, direct = r1_docs["http://legacy.example.org/files/0/fulltext.pdf"]
    assert doc == "https://legacy.example.org/files/0/fulltext.pdf"
    assert direct == "true"
    # slash rewrite: final gained a '/' -> not a direct link
    doc, direct = r1_docs["https://slashy.example.org/dir2"]
    assert doc == "https://slashy.example.org/dir2/"
    assert direct == "false"
