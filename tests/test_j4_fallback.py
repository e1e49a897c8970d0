"""J4 reference-output semantics: "Skipped ... better url selected"
rows for non-best urls (handleLogOfRemainingUrls,
LoaderAndChecker.java:685-698) and the checkRemainingUrls fallback wave
(:534-561) when an id's best url has a connect-level failure.

The synthetic web's generated seeds are one-url-per-id, so this test
adds hand-crafted multi-url ids covering every pool outcome:

  idA  best doc succeeds round 0      -> pool skipped same round
  idB  best 404s, 2nd url resolves    -> fallback wave, 3rd skipped
  idC  every url 404s                 -> pool exhausted, no skipped
  idD  fails, crawl ends before pool empties -> flush rows (round -1)
"""

from __future__ import annotations

import pytest

from publicationsretriever_spark.crawl.oracle import (
    all_urls_of_web,
    compute_verdicts,
    crawl_oracle,
)
from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


def _err(status: int) -> dict:
    return {
        "status": status, "location": None, "content_type": None,
        "content_disposition": None, "content_length": 0,
        "body_kind": "error", "image_id": None, "html_links": [],
    }


def _page(body_links: list[str]) -> dict:
    body = "<html><body>" + "".join(
        f'<a href="{u}">x</a>' for u in body_links
    ) + "</body></html>"
    return {
        "status": 200, "location": None, "content_type": "text/html",
        "content_disposition": None, "content_length": len(body),
        "body_kind": "html", "image_id": None, "html_links": body_links,
        "html_body": body,
    }


@pytest.fixture(scope="module")
def j4_setup(spark):
    web = SyntheticWeb(seed=13, n_hosts=4, pages_per_host_max=6)
    B = "https://host1.example1.org"
    # idA: best (doc-like) succeeds -> the two others are skipped round 0
    web.responses[f"{B}/files/90/fulltext.pdf"] = web._image_response("j4-a")
    web.seeds += [
        ("idA", f"{B}/files/90/fulltext.pdf"),
        ("idA", f"{B}/article/77"),
        ("idA", f"{B}/article/78"),
    ]
    # idB: best (doc-like) 404s -> fallback wave checks /extra-b (a page
    # with no links: resolves) -> the neutral third url is skipped
    web.responses[f"{B}/files/91/fulltext.pdf"] = _err(404)
    web.responses[f"{B}/extra-b"] = _page([])
    # NOTE pool order: rank-2 urls are "last wins" in the reference
    # ladder (LoaderAndChecker slot overwrites), so the LAST-ordered
    # url is injected first — extra-b last makes it the first fallback
    web.seeds += [
        ("idB", f"{B}/files/91/fulltext.pdf"),
        ("idB", f"{B}/article/79"),
        ("idB", f"{B}/extra-b"),
    ]
    # idC: every url 404s -> pool exhausts itself, each url CHECKED
    web.responses[f"{B}/files/92/fulltext.pdf"] = _err(404)
    web.responses[f"{B}/files/93/fulltext.pdf"] = _err(404)
    web.seeds += [
        ("idC", f"{B}/files/92/fulltext.pdf"),
        ("idC", f"{B}/files/93/fulltext.pdf"),
    ]
    # idD: best 404s; extra-d1 (ladder-first) 404s in round 1; at round
    # 1's end extra-d2 is injected into the round-2 frontier that never
    # runs (budget-exhausted row) while extra-d3 stays pooled (skipped
    # flush row) — covers both end-of-crawl paths
    web.responses[f"{B}/files/94/fulltext.pdf"] = _err(404)
    web.responses[f"{B}/extra-d1"] = _err(404)
    web.seeds += [
        ("idD", f"{B}/files/94/fulltext.pdf"),
        ("idD", f"{B}/extra-d3"),
        ("idD", f"{B}/extra-d2"),
        ("idD", f"{B}/extra-d1"),  # last -> injected (and 404s) round 1
    ]
    verdicts = compute_verdicts(spark, all_urls_of_web(web), web)
    engine = CrawlEngine(spark, web, num_buckets=8, host_quota=50)
    state = engine.crawl(web.seeds_df(spark), max_rounds=2)
    seeds = [(sid, n, u) for n, (sid, u) in enumerate(web.seeds)]
    oracle = crawl_oracle(web, verdicts, seeds, max_rounds=2, host_quota=50)
    results = state.results.collect()
    return web, results, oracle


def test_results_multiset_matches_oracle(j4_setup):
    _web, results, oracle = j4_setup
    engine_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in results
    )
    oracle_rows = sorted(
        (r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
        for r in oracle.results
    )
    assert engine_rows == oracle_rows


def test_skipped_rows_match_oracle_exactly(j4_setup):
    _web, results, oracle = j4_setup
    eng = sorted(
        (r["id"], r["sourceUrl"], r["round"], r["error"])
        for r in results if r["error"].startswith("Skipped in LoaderAndChecker")
    )
    ora = sorted(
        (r["id"], r["sourceUrl"], r["round"], r["error"])
        for r in oracle.results
        if (r["error"] or "").startswith("Skipped in LoaderAndChecker")
    )
    assert eng == ora
    assert eng, "no skipped rows produced at all"


def test_one_output_row_per_input_record(j4_setup):
    """The reference's output contract (README.md:19-33): every input
    (id, url) record yields at least one output row — checked,
    discarded, duplicate, or skipped.

    Engine convention (oracle-mirrored): link-derived rows carry the
    LINK url as sourceUrl, so a page seed that resolved via its
    internal links is covered at id level; every url of a MULTI-url id
    is covered explicitly (its rows are seed/fallback/skipped rows,
    which always carry the input url)."""
    web, results, _oracle = j4_setup
    covered_urls = {(r["id"], r["sourceUrl"]) for r in results}
    covered_ids = {r["id"] for r in results}
    n_urls: dict[str, int] = {}
    for sid, _u in web.seeds:
        n_urls[sid] = n_urls.get(sid, 0) + 1
    for sid, url in web.seeds:
        assert sid in covered_ids, f"no output row for id {sid}"
        if n_urls[sid] > 1:
            assert (sid, url) in covered_urls, f"no output row for {(sid, url)}"


def test_scenarios(j4_setup):
    _web, results, _oracle = j4_setup
    B = "https://host1.example1.org"
    rows = {}
    for r in results:
        rows.setdefault(r["id"], []).append(r)
    # idA: doc row round 0 + two skipped rows round 0
    a = rows["idA"]
    assert any(r["docOrDatasetUrl"].endswith("fulltext.pdf") for r in a)
    a_skip = [r for r in a if r["error"].startswith("Skipped")]
    assert {(r["sourceUrl"], r["round"]) for r in a_skip} == {
        (f"{B}/article/77", 0), (f"{B}/article/78", 0),
    }
    # idB: best checked round 0 (error), fallback checked round 1,
    # third url skipped round 1 — wasUrlChecked=false on the skip
    b = rows["idB"]
    b_skip = [r for r in b if r["error"].startswith("Skipped")]
    assert {(r["sourceUrl"], r["round"], r["wasUrlChecked"]) for r in b_skip} == {
        (f"{B}/article/79", 1, "false"),
    }
    assert any(
        r["sourceUrl"] == f"{B}/extra-b" and r["round"] == 1 for r in b
    )
    # idC: both urls actually checked (no skip rows)
    c = rows["idC"]
    assert not any(r["error"].startswith("Skipped") for r in c)
    assert {r["sourceUrl"] for r in c} == {
        f"{B}/files/92/fulltext.pdf", f"{B}/files/93/fulltext.pdf",
    }
    # idD: the never-injected url is flushed with round = -1; the url
    # injected into the never-run round-2 frontier gets the budget row
    d_skip = [r for r in rows["idD"] if r["error"].startswith("Skipped")]
    assert {(r["sourceUrl"], r["round"]) for r in d_skip} == {
        (f"{B}/extra-d3", -1),
    }
    d_pend = [r for r in rows["idD"] if r["error"].startswith("Not checked")]
    assert {(r["sourceUrl"], r["round"]) for r in d_pend} == {
        (f"{B}/extra-d2", -1),
    }
