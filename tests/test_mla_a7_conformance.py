"""J7 structure-MLA + A7 kill-switch conformance vs the sequential
oracle.

J7 (PageStructureMLA.java:65-100, wired at PageCrawler.java:417): once a
doc link's DOM structure is learned for a page-path, later pages on the
same path get that link fetched OUTSIDE the 5/10 candidate caps — the
test web is built so the doc link sits beyond the remaining-links cap
and can ONLY be reached through the model.

A7 (PageCrawler.checkRemainingInternalLinks :710-728): after >=20
remaining-link evaluations with <0.2% doc hit-rate the phase is disabled
globally — later pages' non-doc-like links are never fetched.
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


def _page(host, i, n_pages, n_noise_before_obj):
    """One chain page: sibling link first, then noise links, then the
    obj (doc) link — beyond the 15-link cap when n_noise_before_obj>=16."""
    sibling = f"https://{host}/article/{i + 1}" if i + 1 < n_pages else None
    parts = []
    if sibling:
        parts.append(f'<div class="nav"><a href="{sibling}">next</a></div>')
    for j in range(n_noise_before_obj):
        parts.append(
            f'<div class="meh"><a href="https://{host}/noise/{i}-{j}">n{j}</a></div>'
        )
    parts.append(
        f'<div class="objbox"><a href="https://{host}/obj/{i}">object</a></div>'
    )
    body = "<html><body>{}</body></html>".format("\n".join(parts))
    links = ([sibling] if sibling else []) + [
        f"https://{host}/noise/{i}-{j}" for j in range(n_noise_before_obj)
    ] + [f"https://{host}/obj/{i}"]
    return body, links


class MlaWeb(ErrorWeb):
    """A chain of same-path pages; page0's obj link is reachable within
    the caps (structure gets LEARNED), page2's obj link is beyond the
    caps (reachable only via the learned structure)."""

    HOST = "mlahost.example.org"

    def _build(self):
        h = self.HOST
        n_pages = 4
        for i in range(n_pages):
            # page0 has few noise links (obj within cap); later pages
            # bury obj behind 16 noise links (beyond the 15-link cap)
            noise = 3 if i == 0 else 16
            body, links = _page(h, i, n_pages, noise)
            self.responses[f"https://{h}/article/{i}"] = self._resp(
                200, content_type="text/html", content_length=len(body),
                body_kind="html", html_links=links, html_body=body,
            )
            self.responses[f"https://{h}/obj/{i}"] = self._image(f"img-obj-{i}")
            for j in range(noise):
                self.responses[f"https://{h}/noise/{i}-{j}"] = self._resp(404)
        self._seed("mla::000", f"https://{h}/article/0")


class A7Web(ErrorWeb):
    """Three page waves of 10 pages each, counted on the reference's
    PER-PAGE basis (one eval per checkRemainingInternalLinks CALL,
    PageCrawler.java:715-717): wave 1 (round 0) adds 10 evals — below
    the 20-eval threshold, so wave 2's pages (processed round 1) still
    emit remaining links and push evals to 20 with zero hits; the
    switch latches for round 2, killing wave 3's remaining links."""

    HOST = "a7host.example.org"

    def _page_resp(self, links):
        body = "<html><body><div class=\"c\">{}</div></body></html>".format(
            "".join(f'<a href="{u}">l</a>' for u in links)
        )
        return self._resp(
            200, content_type="text/html", content_length=len(body),
            body_kind="html", html_links=list(links), html_body=body,
        )

    def _build(self):
        h = self.HOST
        for i in range(10):
            self.responses[f"https://{h}/page/{i}"] = self._page_resp(
                [f"https://{h}/nope/{i}", f"https://{h}/second/{i}"]
            )
            self.responses[f"https://{h}/nope/{i}"] = self._resp(404)
            self.responses[f"https://{h}/second/{i}"] = self._page_resp(
                [f"https://{h}/nope2/{i}", f"https://{h}/third/{i}"]
            )
            self.responses[f"https://{h}/nope2/{i}"] = self._resp(404)
            self.responses[f"https://{h}/third/{i}"] = self._page_resp(
                [f"https://{h}/nope3/{i}"]
            )
            self.responses[f"https://{h}/nope3/{i}"] = self._resp(404)
            self._seed(f"a7::{i:03d}", f"https://{h}/page/{i}")


def _crawl_both(spark, web, max_rounds, host_quota=1000):
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(spark, web, num_buckets=4, host_quota=host_quota)
    state = engine.crawl(web.seeds_df(spark), max_rounds=max_rounds)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(web, verdicts, seeds, max_rounds=max_rounds,
                          host_quota=host_quota)
    return state, oracle


def _results_key(rows):
    return sorted((r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
                  for r in rows)


def test_structure_mla_shortcuts_the_capped_link(spark):
    web = MlaWeb()
    state, oracle = _crawl_both(spark, web, max_rounds=4)
    assert _results_key(state.results.collect()) == _results_key(oracle.results)
    # the model learned (page_path, objbox-structure) from page0's doc
    model = {(r["page_path"], r["structure"])
             for r in state.structure_model.collect()}
    assert any("objbox" in s for _p, s in model), model
    docs = {
        r["sourceUrl"]
        for r in state.results.filter(
            ~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")
        ).collect()
    }
    # page0's obj was in-cap (learned from); page1 was processed BEFORE
    # the model existed -> its buried obj link was cap-dropped; page2
    # was processed WITH the model -> its buried obj link was fetched
    assert f"https://{web.HOST}/obj/0" in docs
    assert f"https://{web.HOST}/obj/1" not in docs
    assert f"https://{web.HOST}/obj/2" in docs


def test_a7_kill_switch_disables_remaining_links(spark):
    web = A7Web()
    state, oracle = _crawl_both(spark, web, max_rounds=4)
    assert _results_key(state.results.collect()) == _results_key(oracle.results)
    srcs = {r["sourceUrl"] for r in state.results.collect()}
    # round 1 fetched the first-wave dead links (10 page-evals)...
    assert f"https://{web.HOST}/nope/0" in srcs
    # ...second-wave pages were processed in round 1 with the switch
    # still on (evals 10 < 20), so their links went out normally...
    assert any("/nope2/" in s for s in srcs)
    # ...but third-wave pages (processed round 2; evals hit 20 with 0
    # hits at the end of round 1) had their remaining links killed
    assert not any("/nope3/" in s for s in srcs)
    m = state.metrics[-1]
    assert m["remaining_evals"] >= 20
    assert m["remaining_hits"] == 0
