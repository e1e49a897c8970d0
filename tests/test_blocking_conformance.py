"""A2/A3/A4 blocking conformance: the engine's exact domain/path
blocking rules (operators/blocking.py) vs the sequential oracle on an
error-injecting synthetic web.

Covers, with observable cross-round effects:
- 5XX > 10 blocks a domain (countAndBlockDomainAfterTimes,
  ConnSupportUtils.java:924-944) — its round-1 link is silently dropped.
- the good-hit buffer zone: a domain with 12 5XXs but 60 doc-hit goods
  is NOT blocked — its round-1 doc link is fetched.
- timeouts > 25 block (threshold 25, :90).
- unknown status codes block immediately (:693-705).
- no-type > 10 and not-doc-nor-page > 10 block (:92, HttpConnUtils.java:71).
- 403-path rule (:800-846): a path 403'd >10 times is blocked — the
  round-1 link into it gets a "path 403-blacklisted" result row; a
  domain with >50 blocked paths is blocked entirely.
- the zenodo/doi never-block set (:902-909): an exempt domain keeps
  being fetched across spill rounds while an identical non-exempt
  domain is cut off.
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
from publicationsretriever_spark.sources.imagecodec import make_payload_row


class ErrorWeb:
    """Hand-built hermetic web exercising every blocking rule."""

    def __init__(self):
        self.responses: dict[str, dict] = {}
        self.payloads: dict[str, dict] = {}
        self.seeds: list[tuple[str, str]] = []
        self.robots: dict[str, list[str]] = {}
        self._build()

    @staticmethod
    def _resp(status, **kw):
        base = {
            "status": status, "location": None, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "error", "image_id": None, "html_links": [],
        }
        base.update(kw)
        return base

    def _image(self, image_id):
        if image_id not in self.payloads:
            self.payloads[image_id] = make_payload_row(image_id)
        data = self.payloads[image_id]
        return self._resp(
            200, content_type="image/png", content_length=len(data["bytes"]),
            body_kind="image", image_id=image_id,
        )

    def _seed(self, sid, url):
        self.seeds.append((sid, url))

    def _build(self):
        # 1. err5xx: 12 x HTTP 500 -> blocked after round 0 (12 > 10, good 0)
        for i in range(12):
            u = f"https://err5xx.example.org/e/{i}"
            self.responses[u] = self._resp(500)
            self._seed(f"err5xx::{i:03d}", u)
        # 2. offset: 12 x 500 BUT 30 doc hits -> good=60 -> NOT blocked
        for i in range(12):
            u = f"https://offset.example.org/e/{i}"
            self.responses[u] = self._resp(500)
            self._seed(f"offset-e::{i:03d}", u)
        for i in range(30):
            u = f"https://offset.example.org/files/{i}/fulltext.pdf"
            self.responses[u] = self._image(f"img-off-{i}")
            self._seed(f"offset-d::{i:03d}", u)
        # 3. timeo: 30 timeouts -> blocked (threshold 25)
        for i in range(30):
            u = f"https://timeo.example.org/t/{i}"
            self.responses[u] = self._resp(-1)
            self._seed(f"timeo::{i:03d}", u)
        # 4. unk: one HTTP 999 -> immediate block
        u = "https://unk.example.org/u/0"
        self.responses[u] = self._resp(999)
        self._seed("unk::000", u)
        # 5. ntype: 12 x 200 with no type info at all -> no-type > 10
        for i in range(12):
            u = f"https://ntype.example.org/x/{i}"
            self.responses[u] = self._resp(200, body_kind="other")
            self._seed(f"ntype::{i:03d}", u)
        # 6. ndp: 12 x 200 video/mp4 (typed, but neither doc nor page —
        #    text/plain and application/json would NOT work: both are in
        #    the reference's known doc/dataset mime lists,
        #    ConnSupportUtils.java:149-244) -> not-doc-nor-page > 10
        for i in range(12):
            u = f"https://ndp.example.org/y/{i}"
            self.responses[u] = self._resp(
                200, content_type="video/mp4", body_kind="other"
            )
            self._seed(f"ndp::{i:03d}", u)
        # 7. pathy: /forbidden/ 403'd 12x -> path blocked; /open/ stays
        for i in range(12):
            u = f"https://pathy.example.org/forbidden/f{i}"
            self.responses[u] = self._resp(403)
            self._seed(f"pathy-f::{i:03d}", u)
        u = "https://pathy.example.org/open/g0"
        self.responses[u] = self._image("img-pathy-open")
        self._seed("pathy-o::000", u)
        # 8. bigpath: 52 distinct paths x 12 403s each -> 52 blocked paths
        #    > 50 -> whole domain blocked
        for p in range(52):
            for i in range(12):
                u = f"https://bigpath.example.org/p{p}/f{i}"
                self.responses[u] = self._resp(403)
                self._seed(f"bigpath::{p:02d}-{i:02d}", u)
        # 9. linker: one healthy page whose round-1 links probe every
        #    blocked/exempted domain above
        links = [
            "https://offset.example.org/files/99/fulltext.pdf",  # fetched (good offset)
            "https://err5xx.example.org/e/99",     # dropped (blocked)
            "https://timeo.example.org/t/99",      # dropped (blocked)
            "https://unk.example.org/u/9",         # dropped (blocked)
            "https://ntype.example.org/x/99",      # dropped (blocked)
            "https://ndp.example.org/y/99",        # dropped (blocked)
            "https://pathy.example.org/forbidden/f99",  # "path 403-blacklisted" row
            "https://pathy.example.org/open/g1",   # fetched (only the path is blocked)
            "https://bigpath.example.org/p0/f99",  # dropped (>50 paths -> domain)
        ]
        body = "<html><body><div>{}</div></body></html>".format(
            "\n".join(f'<a href="{u}">link {i}</a>' for i, u in enumerate(links))
        )
        page = "https://linker.example.org/article/0"
        self.responses[page] = self._resp(
            200, content_type="text/html", content_length=len(body),
            body_kind="html", html_links=links, html_body=body,
        )
        self.responses["https://offset.example.org/files/99/fulltext.pdf"] = (
            self._image("img-off-99")
        )
        self.responses["https://pathy.example.org/forbidden/f99"] = self._resp(403)
        self.responses["https://pathy.example.org/open/g1"] = self._image(
            "img-pathy-open2"
        )
        self._seed("linker::000", page)

    # -- oracle + engine interfaces (same contract as SyntheticWeb) ------
    def resolve(self, url):
        return self.responses.get(url, self._resp(404))

    def seeds_df(self, spark):
        rows = [(sid, n, u) for n, (sid, u) in enumerate(self.seeds)]
        return spark.createDataFrame(rows, ["id", "order_in_id", "url"])

    def robots_df(self, spark):
        rows = [(h, rules) for h, rules in sorted(self.robots.items())]
        return spark.createDataFrame(rows, "domain string, disallow array<string>")

    def payloads_df(self, spark):
        rows = [
            (p["image_id"], bytearray(p["bytes"]), p["w"], p["h"], p["fmt"],
             p["caption"], p["phash"])
            for p in sorted(self.payloads.values(), key=lambda p: p["image_id"])
        ]
        return spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )


class SpillWeb(ErrorWeb):
    """60 identical 500-urls on an EXEMPT domain (zenodo.org) and on a
    blockable twin; with host_quota=8 the spill re-enters each round, so
    the exempt domain keeps erroring while the twin is cut off after its
    counter crosses 10."""

    def _build(self):
        for i in range(60):
            u = f"https://zenodo.org/api/e{i}"
            self.responses[u] = self._resp(500)
            self._seed(f"zen::{i:03d}", u)
            u2 = f"https://blockme.example.org/api/e{i}"
            self.responses[u2] = self._resp(500)
            self._seed(f"blk::{i:03d}", u2)


def _crawl_both(spark, web, host_quota, max_rounds):
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(spark, web, num_buckets=8, host_quota=host_quota)
    state = engine.crawl(web.seeds_df(spark), max_rounds=max_rounds)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(
        web, verdicts, seeds, max_rounds=max_rounds, host_quota=host_quota
    )
    return state, oracle


def _results_key(rows):
    # same key as tests/test_crawl_conformance.py — the error column is
    # engine-specific prose (functions/retry.py ports the reference's
    # messages), the oracle logs error-class keys
    return sorted((r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
                  for r in rows)


@pytest.fixture(scope="module")
def blocking_setup(spark):
    web = ErrorWeb()
    state, oracle = _crawl_both(spark, web, host_quota=1000, max_rounds=2)
    return web, state, oracle


def test_results_match_oracle_with_blocking(blocking_setup):
    _web, state, oracle = blocking_setup
    assert _results_key(state.results.collect()) == _results_key(oracle.results)


def test_blocked_domains_match_oracle(blocking_setup):
    _web, state, oracle = blocking_setup
    engine_blocked = {r["domain"] for r in state.blocked_domains.collect()}
    assert engine_blocked == oracle.blocked
    # the specific verdicts the rules must produce
    assert "err5xx.example.org" in engine_blocked      # 5XX > 10
    assert "timeo.example.org" in engine_blocked       # timeouts > 25
    assert "unk.example.org" in engine_blocked         # unknown code
    assert "ntype.example.org" in engine_blocked       # no-type > 10
    assert "ndp.example.org" in engine_blocked         # not-doc-nor-page > 10
    assert "bigpath.example.org" in engine_blocked     # >50 blocked paths
    assert "offset.example.org" not in engine_blocked  # good-hit buffer zone
    assert "pathy.example.org" not in engine_blocked   # only one path blocked


def test_blocked_paths_match_oracle(blocking_setup):
    _web, state, oracle = blocking_setup
    engine_paths = {
        (r["domain"], r["path"]) for r in state.blocked_paths.collect()
    }
    assert ("pathy.example.org", "https://pathy.example.org/forbidden/") in engine_paths
    assert all(p[0] != "pathy.example.org" or "forbidden" in p[1]
               for p in engine_paths)
    assert engine_paths == oracle.blocked_paths


def test_round1_effects(blocking_setup):
    """The linker page's round-1 probes: blocked domains vanish, the
    403-blocked path gets its result row, the good-offset domain and the
    unblocked path are fetched."""
    _web, state, _oracle = blocking_setup
    r1 = {
        r["sourceUrl"]: (r["docOrDatasetUrl"], r["error"])
        for r in state.results.filter(
            (F.col("round") == 1) & (F.col("id") == "linker::000")
        ).collect()
    }
    assert r1["https://offset.example.org/files/99/fulltext.pdf"][0] != "unreachable"
    assert r1["https://pathy.example.org/forbidden/f99"][1] == "path 403-blacklisted"
    assert r1["https://pathy.example.org/open/g1"][0] != "unreachable"
    for gone in (
        "https://err5xx.example.org/e/99",
        "https://timeo.example.org/t/99",
        "https://unk.example.org/u/9",
        "https://ntype.example.org/x/99",
        "https://ndp.example.org/y/99",
        "https://bigpath.example.org/p0/f99",
    ):
        assert gone not in r1, f"{gone} should have been dropped as blocked"


def test_exempt_domain_never_blocked_across_spill_rounds(spark):
    web = SpillWeb()
    state, oracle = _crawl_both(spark, web, host_quota=8, max_rounds=3)
    assert _results_key(state.results.collect()) == _results_key(oracle.results)
    blocked = {r["domain"] for r in state.blocked_domains.collect()}
    assert "blockme.example.org" in blocked
    assert "zenodo.org" not in blocked
    # zenodo keeps being fetched every round; blockme stops after its
    # counter crossed 10 at the end of round 1
    # round -1 rows are the J4 end-of-crawl budget flush (seeds still
    # quota-spilled when max_rounds ran out) — not fetch outcomes
    per_round = {
        (r["round"],
         "zen" if "zenodo" in r["sourceUrl"] else "blk"): 1
        for r in state.results.filter(
            (F.col("docOrDatasetUrl") == "unreachable")
            & (F.col("round") >= 0)
        ).collect()
    }
    zen_rounds = {k[0] for k in per_round if k[1] == "zen"}
    blk_rounds = {k[0] for k in per_round if k[1] == "blk"}
    assert zen_rounds == {0, 1, 2}
    assert blk_rounds == {0, 1}
