"""J6+A8 wiring: path-MLA prediction behind use_mla=True, gated by the
A8 state machine, conformant with the sequential oracle, with gate
state round-tripping through snapshot lineage.

Web: a chain of same-path pages /view/p<i> whose doc lives at
/obj/p<i> (deliberately NOT doc-like, so the candidate caps can bury
it; .html sibling links would be F15-rejected and .pdf docs would
always rank within the doclike cap). Page p0's doc link is within the
remaining-cap (the model LEARNS page_path->doc_path from it); later
pages bury the doc link behind 16 noise links (beyond the 15-link
remaining window) — reachable ONLY via the MLA prediction doc_path +
docid. A hit also SUPPRESSES the page's other candidates (the
reference returns from visit() on a successful prediction), so the
noise links of a predicted page are never fetched — the "MLA
shortcuts a fetch" criterion.
"""

from __future__ import annotations

import pytest

from publicationsretriever_spark.crawl.oracle import (
    all_urls_of_web,
    compute_verdicts,
    crawl_oracle,
)
from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.plans.stats import MlaGate
from publicationsretriever_spark.sources.catalog import SnapshotCatalog
from test_blocking_conformance import ErrorWeb


class PathMlaWeb(ErrorWeb):
    HOST = "mlapath.example.org"
    N_PAGES = 5

    def _build(self):
        h = self.HOST
        for i in range(self.N_PAGES):
            page = f"https://{h}/view/p{i}"
            doc = f"https://{h}/obj/p{i}"
            noise = 2 if i == 0 else 16  # bury the doc beyond caps later
            links = []
            if i + 1 < self.N_PAGES:
                links.append(f"https://{h}/view/p{i + 1}")
            links += [f"https://{h}/noise/{i}-{j}" for j in range(noise)]
            links.append(doc)
            body = "<html><body>{}</body></html>".format(
                "".join(f'<div class="c"><a href="{u}">x</a></div>' for u in links)
            )
            self.responses[page] = self._resp(
                200, content_type="text/html", content_length=len(body),
                body_kind="html", html_links=links, html_body=body,
            )
            self.responses[doc] = self._image(f"img-p{i}")
            for j in range(noise):
                self.responses[f"https://{h}/noise/{i}-{j}"] = self._resp(404)
        self._seed("mlapath::000", f"https://{h}/view/p0")


def _gate():
    g = MlaGate()
    g.URLS_TO_GATHER_BEFORE_STARTING = 0  # tiny web: start immediately
    return g


def _crawl_both(spark, web, max_rounds, catalog=None):
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(
        spark, web, num_buckets=4, host_quota=1000,
        use_mla=True, mla_gate=_gate(),
    )
    state = engine.crawl(web.seeds_df(spark), max_rounds=max_rounds,
                         catalog=catalog)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(web, verdicts, seeds, max_rounds=max_rounds,
                          host_quota=1000, use_mla=True, mla_gate=_gate())
    return engine, state, oracle


def _key(rows):
    return sorted((r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
                  for r in rows)


def test_mla_prediction_matches_oracle_and_shortcuts(spark):
    web = PathMlaWeb()
    engine, state, oracle = _crawl_both(spark, web, max_rounds=5)
    results = state.results.collect()
    assert _key(results) == _key(oracle.results)
    h = web.HOST
    docs = {
        r["sourceUrl"] for r in results
        if r["docOrDatasetUrl"] not in ("duplicate", "unreachable")
    }
    # p0's doc found normally (in-cap) -> model learned from it
    assert f"https://{h}/obj/p0" in docs
    # p1 was processed BEFORE the model existed: buried doc cap-dropped
    assert f"https://{h}/obj/p1" not in docs
    # p2 was processed WITH the model: doc found via prediction
    assert f"https://{h}/obj/p2" in docs
    # ...and the prediction SUPPRESSED p2's other candidates: its noise
    # links were never fetched (the shortcut)
    assert not any(f"/noise/2-" in s for s in
                   (r["sourceUrl"] for r in results))
    # but p1's noise links (pre-model) were fetched normally
    assert any("/noise/1-" in r["sourceUrl"] for r in results)
    # model content is the learned (page_path -> doc_path) pair
    # (extension-less docs: doc_ext stays null)
    model = {(r["page_path"], r["doc_path"], r["doc_ext"])
             for r in state.path_model.collect()}
    assert (f"https://{h}/view/", f"https://{h}/obj/", None) in model
    # gate counters observed rounds and found at least one MLA doc
    m = state.metrics[-1]
    assert m["mla_gate"]["found"] >= 1
    assert m["mla_gate"]["checked"] >= 1
    assert m["mla_gate"]["gathered"] >= 1


def test_mla_gate_state_round_trips_through_lineage(spark, tmp_path):
    web = PathMlaWeb()
    _eng, reference, _oracle = _crawl_both(spark, web, max_rounds=5)

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    CrawlEngine(
        spark, web, num_buckets=4, host_quota=1000,
        use_mla=True, mla_gate=_gate(),
    ).crawl(web.seeds_df(spark), max_rounds=3, catalog=cat)
    resumed_engine = CrawlEngine(
        spark, web, num_buckets=4, host_quota=1000,
        use_mla=True, mla_gate=_gate(),
    )
    resumed = resumed_engine.crawl(None, max_rounds=5, catalog=cat, resume=True)
    assert _key(resumed.results.collect()) == _key(reference.results.collect())
    # the resumed engine's gate equals the uninterrupted one's
    assert resumed.metrics[-1]["mla_gate"] == reference.metrics[-1]["mla_gate"]
