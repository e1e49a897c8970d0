"""Sequential single-process crawl oracle.

Implements the engine's ROUND-GRANULAR semantics (SURVEY.md §3.1 —
the deliberate, documented cleanup of the reference's racy global
state: updates visible at round boundaries) in plain Python loops.
The conformance test (tests/test_crawl_conformance.py) asserts the
distributed engine produces EXACTLY this oracle's results multiset,
URL-seen set, and per-round crawl order.

Per-URL scalar verdicts (filter battery, canonicalization, hashes,
mime classification) are shared with the engine via precomputed maps —
those functions are independently golden-tested against the reference
rules (tests/test_filters.py etc.); what this oracle validates is the
ORCHESTRATION: dedup/selection/caps/ordering/state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.htmlparse import extract_links_one as _extract_links_one
from ..sources.synthetic_web import SyntheticWeb

MAX_PAGE_REDIRECTS = 7
MAX_LINK_REDIRECTS = 2
MAX_POSSIBLE_DOC_LINKS = 5
MAX_REMAINING_LINKS = 10
MAX_LINKS_PER_PAGE = 500


@dataclass
class Verdicts:
    """Per-URL scalar verdict maps, computed once via the Spark column
    functions over every URL that can appear in the crawl."""

    page_reject: dict[str, str | None]
    link_reject: dict[str, str | None]
    canon: dict[str, str | None]      # clean+canonicalized form
    url_hash: dict[str, int]          # xxhash64(canon)
    top3: dict[str, str | None]
    path: dict[str, str | None]       # getPathStr page-path (U.path_of)
    fetch_url: dict[str, str]         # canon -> P9-rewritten
    doc_like: dict[str, bool]
    mime_category: dict[str, str | None]  # final_url -> document/dataset/None
    docid: dict[str, str | None]      # getDocIdStr (U.doc_id_of) — J6


def compute_verdicts(spark, urls: list[str], web: SyntheticWeb) -> Verdicts:
    from pyspark.sql import functions as F

    from ..functions import filters as FL
    from ..functions import mime as M
    from ..functions import urls as U

    df = spark.createDataFrame([(u,) for u in sorted(set(urls))], ["url"])
    df = df.withColumn("clean", U.clean_url(F.col("url")))
    df = df.withColumn("canon", U.canonicalize_udf(F.col("clean")))
    df = U.with_special_rewrite(df, "canon", "fetch_url")
    rows = df.select(
        "url",
        FL.DEFAULT_BATTERY.page_url_reject_reason(F.lower(F.col("url"))).alias("pr"),
        FL.DEFAULT_BATTERY.internal_link_reject_reason(F.lower(F.col("url"))).alias("lr"),
        "canon",
        F.xxhash64("canon").alias("h"),
        U.top3_domain(U.domain_of(F.col("url"))).alias("top3"),
        "fetch_url",
        (
            FL.is_possible_doc_url(F.lower(F.col("url")))
            | FL.is_possible_dataset_url(F.lower(F.col("url")))
        ).alias("dl"),
        U.path_of(F.col("url")).alias("pp"),
        U.doc_id_of(F.col("url")).alias("did"),
    ).collect()
    v = Verdicts({}, {}, {}, {}, {}, {}, {}, {}, {}, {})
    for r in rows:
        u = r["url"]
        v.page_reject[u] = r["pr"]
        v.link_reject[u] = r["lr"]
        v.canon[u] = r["canon"]
        v.url_hash[u] = r["h"]
        v.top3[u] = r["top3"]
        v.fetch_url[u] = r["fetch_url"]
        v.doc_like[u] = bool(r["dl"])
        v.path[u] = r["pp"]
        v.docid[u] = r["did"]

    # top3 for canonical-form strings too (the engine derives the
    # doc-url domain of a re-crossed row from its canon url)
    canon_strs = sorted({c for c in v.canon.values() if c} - set(v.top3))
    if canon_strs:
        cdf = spark.createDataFrame([(c,) for c in canon_strs], ["url"])
        for r in cdf.select(
            "url", U.top3_domain(U.domain_of(F.col("url"))).alias("top3")
        ).collect():
            v.top3.setdefault(r["url"], r["top3"])

    # mime classification per response url (engine computes it on the
    # redirect-resolved final_url's response record)
    resp_urls = sorted(web.responses)
    rdf = spark.createDataFrame(
        [
            (u, web.responses[u]["content_type"], web.responses[u]["content_disposition"])
            for u in resp_urls
        ],
        "url string, ct string, cd string",
    )
    mrows = rdf.select(
        "url", M.classify_mime(F.col("url"), F.col("ct"), F.col("cd"))["mime_category"].alias("mc")
    ).collect()
    for r in mrows:
        v.mime_category[r["url"]] = r["mc"]
    return v


def all_urls_of_web(web: SyntheticWeb) -> list[str]:
    urls = set(u for _, u in web.seeds)
    for u, r in web.responses.items():
        urls.add(u)
        if r["location"]:
            urls.add(r["location"])
        urls.update(r["html_links"] or [])
    return sorted(urls)


#: A2/A3/A4 thresholds + exempt set — mirrors operators/blocking.py
#: (ConnSupportUtils.java:84-92,902-909; HttpConnUtils.java:71;
#: PageCrawler.java:52-53)
EXEMPT_DOMAINS = {"zenodo.org", "doi.org", "dx.doi.org"}
COUNTER_THRESHOLDS = {
    "n5xx": 10, "n_timeout": 25, "n_notype": 10, "n_notdocnorpage": 10,
    "n_nodocurls": 100, "n_nolinks": 200,
}
THRESH_403_PATH = 10
THRESH_BLOCKED_PATHS_PER_DOMAIN = 50

#: HttpConnUtils.ENDING_WITH_SLASH_OR_EXTENSION_FILTER (:83)
import re as _re_mod  # noqa: E402

ENDING_WITH_SLASH_OR_EXTENSION = _re_mod.compile(
    r".*(?:(?:/|\.[^.?&/_-]{1,7})(?:\?.+)?|\?.+)$"
)


def dir_path(url: str) -> str:
    """UrlUtils.getPathStr — prefix up to and incl. the last '/',
    after stripping one trailing '/' (getUrlMatcher's 'mistake'
    rule). Mirrors operators/blocking.dir_path."""
    if url.endswith("/"):
        url = url[:-1]
    i = url.rfind("/")
    return url[: i + 1] if i >= 0 else ""


@dataclass
class OracleState:
    results: list[dict] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)
    order_log: list[tuple] = field(default_factory=list)
    # cumulative A2/A3 counters (round-granular, like the engine)
    dom_counts: dict = field(default_factory=dict)   # domain -> counter dict
    path_counts: dict = field(default_factory=dict)  # (domain, path) -> n403
    blocked_paths: set = field(default_factory=set)  # (domain, path)
    # P11: learned offline-redirect domains (HttpConnUtils.java:613-623)
    https_domains: set = field(default_factory=set)
    slash_domains: set = field(default_factory=set)
    # J7: structure-MLA model (PageStructureMLA.java:35-40)
    structure_model: set = field(default_factory=set)  # (page_path, structure)
    # A7: remaining-links kill-switch counters (PageCrawler.java:60-61)
    rem_evals: int = 0
    rem_hits: int = 0
    # J4: fallback pool — id -> ladder-ordered list of non-best rows
    # (checkRemainingUrls, LoaderAndChecker.java:534-561)
    fallback_pool: dict = field(default_factory=dict)
    # J6: path-MLA model (MachineLearning.successPathsHashMultiMap /
    # successDocPathsExtensionHashMap)
    path_model: dict = field(default_factory=dict)  # page_path -> set(doc_path)
    path_ext: dict = field(default_factory=dict)    # doc_path -> ext (max)


#: mirrors rounds.PLAIN_PAGE_EXT_RE
PLAIN_PAGE_EXT_RE = _re_mod.compile(
    r"\.(?:html?|php\d?|aspx?|jsp|jspx|do|asp|cfm|cgi|shtml)$", _re_mod.I
)
DOC_EXT_RE = _re_mod.compile(r"(\.[A-Za-z0-9]{1,7})$")


def crawl_oracle(
    web: SyntheticWeb,
    verdicts: Verdicts,
    seeds: list[tuple[str, int, str]],
    max_rounds: int = 3,
    host_quota: int = 50,
    use_mla: bool = False,
    mla_gate=None,
) -> OracleState:
    """seeds: (id, order_in_id, url)."""
    v = verdicts
    st = OracleState()
    if use_mla and mla_gate is None:
        from ..plans.stats import MlaGate

        mla_gate = MlaGate()
    _off = 1 if use_mla else 0
    frontier = [
        {"id": i, "order_in_id": o, "url": u, "depth": 0, "kind": "seed"}
        for i, o, u in seeds
    ]

    def emit(rnd, id_, src, doc, err):
        st.results.append(
            {"id": id_, "sourceUrl": src, "docOrDatasetUrl": doc, "round": rnd, "error": err}
        )

    def xxh(u):  # hash of an arbitrary final url
        return v.url_hash.get(u)

    for rnd in range(max_rounds):
        if not frontier:
            break
        # A8 gate: one decision per round (mirrors CrawlEngine)
        mla_predict_on = use_mla and mla_gate.should_run_prediction()
        # stage: gate + canon
        staged = []
        for row in frontier:
            u = row["url"]
            # gate follows the row KIND (seeds/redirects: page battery,
            # internal links: link battery) — mirrors prepare_frontier
            reject = (
                v.link_reject[u] if row["kind"] == "internal"
                else v.page_reject[u]
            )
            # engine order: domain gate first, then battery
            if v.top3.get(u) is None:
                reject = "domain_unretrievable"
            canon = v.canon.get(u)
            if reject is None and canon is None:
                reject = "unnormalizable"
            staged.append({**row, "reject": reject, "canon": canon,
                           "hash": v.url_hash.get(u) if canon else None,
                           "top3": v.top3.get(u)})
        new_seen = set()
        for r in staged:
            if r["hash"] is not None:
                new_seen.add(r["hash"])
        # rejected
        ok = []
        for r in staged:
            if r["reject"] is not None:
                emit(rnd, r["id"], r["url"], "unreachable", f"Discarded: {r['reject']}")
            else:
                ok.append(r)
        # in-round dedup: first by (order_in_id, id) per hash
        ok.sort(key=lambda r: (r["order_in_id"], r["id"]))
        first: dict[int, dict] = {}
        for r in ok:
            if r["hash"] in first or r["hash"] in st.seen:
                emit(rnd, r["id"], r["url"], "duplicate", "duplicate url")
            else:
                first[r["hash"]] = r
        unseen = list(first.values())
        # best per id (round 0): fold semantics (rank0 first-wins, 1-3 last-wins)
        def _prio(u: str) -> int:
            return (
                0 if v.doc_like[u]
                else 1 if "/handle/" in u
                else 2 if "doi.org" not in u
                else 3
            )

        if rnd == 0:
            by_id: dict[str, list[dict]] = {}
            for r in unseen:
                by_id.setdefault(r["id"], []).append(r)
            picked = []
            for _id, rows in by_id.items():
                rows.sort(key=lambda r: r["order_in_id"])
                best, best_rank = None, 99
                for r in rows:
                    u = r["url"]
                    rank = _prio(u)
                    if rank == 0 and best_rank != 0:
                        best, best_rank = r, 0
                    elif rank != 0 and rank <= best_rank and best_rank != 0:
                        best, best_rank = r, rank
                    elif rank < best_rank:
                        best, best_rank = r, rank
                picked.append(best)
                # J4 pool: non-best urls in candidate-ladder order; the
                # hashes stay OUT of the seen set (not yet checked)
                rest = [r for r in rows if r is not best]
                rest.sort(
                    key=lambda r: (
                        _prio(r["url"]),
                        r["order_in_id"] if _prio(r["url"]) == 0
                        else -r["order_in_id"],
                    )
                )
                if rest:
                    st.fallback_pool[_id] = rest
                    for r in rest:
                        new_seen.discard(r["hash"])
        else:
            picked = unseen
        # J4 attempt tracking: the id's best (round 0) or its fallback/
        # spill re-entry (kind seed|fallback) this round
        if rnd == 0:
            attempts = {r["id"] for r in picked}
        else:
            attempts = {
                r["id"] for r in frontier if r["kind"] in ("seed", "fallback")
            }
        resolved: set = set()
        # round-delta A2/A3 counters (merged + evaluated at round end,
        # mirroring the engine's round-granular blocking)
        rd_dom: dict[str, dict] = {}
        rd_path: dict[tuple, int] = {}

        def bump(domain, counter, by=1):
            if domain is None:
                return
            rd_dom.setdefault(domain, {})[counter] = (
                rd_dom.get(domain, {}).get(counter, 0) + by
            )

        # re-cross vs prior results (min-id owner); each re-crossed row
        # is an output docUrl row: +1 good for page AND doc domains
        # (UrlUtils.java:113-119 via handleReCrossedTargetUrl)
        prior: dict[str, str] = {}
        for res in st.results:
            d = res["docOrDatasetUrl"]
            if d not in ("duplicate", "unreachable"):
                if d not in prior or res["id"] < prior[d]:
                    prior[d] = res["id"]
        to_fetch = []
        for r in picked:
            if r["canon"] in prior:
                emit(rnd, r["id"], r["url"], r["canon"], None)
                bump(r["top3"], "good")
                bump(v.top3.get(r["canon"]), "good")
                # re-cross = connectAndCheckMimeType returns true
                if r["kind"] in ("seed", "fallback"):
                    resolved.add(r["id"])
            else:
                to_fetch.append(r)
        # gate ladder in engine order: blacklist (silent) -> 403-path ->
        # robots -> quota
        to_fetch = [r for r in to_fetch if r["top3"] not in st.blocked]
        allowed = []
        for r in to_fetch:
            fetch_u = v.fetch_url.get(r["url"], r["canon"])
            if (r["top3"], dir_path(fetch_u or "")) in st.blocked_paths:
                emit(rnd, r["id"], r["url"], "unreachable", "path 403-blacklisted")
                continue
            import re as _re2
            pth = _re2.sub(r"^https?://[^/]*", "", fetch_u or "")
            rules = web.robots.get(r["top3"], [])
            if any(pth.startswith(pre) for pre in rules):
                emit(rnd, r["id"], r["url"], "unreachable", "robots disallowed")
            else:
                allowed.append(r)
        to_fetch = allowed
        by_host: dict[str, list[dict]] = {}
        for r in to_fetch:
            by_host.setdefault(r["top3"], []).append(r)
        fetch_now, spill = [], []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (0, r["hash"]))  # priority const, url_hash
            fetch_now.extend(rows[:host_quota])
            spill.extend(rows[host_quota:])
        # spilled rows are NOT yet checked: their hashes must stay out of
        # the seen set so the re-entry next round is fetchable
        for r in spill:
            new_seen.discard(r["hash"])
        # fetch: deterministic order (host, url_hash)
        fetch_now.sort(key=lambda r: (r["top3"], r["hash"]))
        next_frontier = [
            {"id": r["id"], "order_in_id": r["order_in_id"], "url": r["url"],
             "depth": r["depth"], "kind": r["kind"],
             "page_final": r.get("page_final"),
             "structure": r.get("structure"), "phase": r.get("phase")}
            for r in spill
        ]
        rd_https: set = set()
        rd_slash: set = set()
        rd_model: set = set()
        # A7 per-PAGE basis (PageCrawler.java:715-717,761): evals
        # counted once per page that emits >=1 remaining candidate (at
        # candidate-generation time), hits once per parent page whose
        # remaining link verified as doc (at fetch time, next round)
        rd_rem_evals = 0
        rd_rem_hit_pages: set = set()
        # J6/A8 round deltas (model visible from NEXT round, like the
        # engine's path_model dimension table)
        rd_pm_pairs: set = set()
        rd_pm_ext: dict = {}
        rd_mla_gather = rd_mla_pages = rd_mla_checked = 0
        rd_mla_found_pages: set = set()
        # A7 flag evaluated ONCE at round start from prior rounds' counters
        remaining_on = (
            st.rem_evals < 20 or (st.rem_hits / st.rem_evals) >= 0.002
        )
        spilled_ids = {
            r["id"] for r in spill if r["kind"] in ("seed", "fallback")
        }
        for r in fetch_now:
            st.order_log.append((rnd, r["top3"], r["hash"]))
            _att = r["kind"] in ("seed", "fallback")
            max_hops = (
                MAX_PAGE_REDIRECTS if r["kind"] in ("seed", "redirect", "fallback")
                else MAX_LINK_REDIRECTS
            )
            url = v.fetch_url.get(r["url"], r["canon"])
            # P11 apply: offline https/slash rewrite from PRIOR rounds'
            # learned flags (HttpConnUtils.java:326-334)
            if r["top3"] in st.https_domains and url.startswith("http://"):
                url = "https://" + url[7:]
            if (
                r["top3"] in st.slash_domains
                and not ENDING_WITH_SLASH_OR_EXTENSION.fullmatch(url)
            ):
                url += "/"
            hops = 0
            resp = web.resolve(url)
            # 3XX except 304 redirect; 2XX and 304 succeed
            # (HttpConnUtils.java:284-288,631) — mirrors the fetch UDF
            while (300 <= resp["status"] <= 399 and resp["status"] != 304) and hops < max_hops:
                loc = resp["location"]
                if loc is None and resp["status"] == 300:
                    # HTTP-300 body-link extraction — mirrors the fetch
                    # UDF (ConnSupportUtils.java:608-627)
                    body = resp.get("html_body")
                    if body:
                        for _c in _extract_links_one(body, url):
                            if _c.get("link"):
                                loc = _c["link"]
                                break
                if loc is None:
                    break
                # P11 learn: protocol-only / slash-only hop -> target domain
                if (
                    url.startswith("http://") and loc.startswith("https://")
                    and url[7:] == loc[8:]
                ):
                    rd_https.add(v.top3.get(loc))
                if not url.endswith("/") and loc == url + "/":
                    rd_slash.add(v.top3.get(loc))
                hops += 1
                url = loc
                resp = web.resolve(url)
            if xxh(url) is not None:
                new_seen.add(xxh(url))
            status = resp["status"]
            # handle.net 500 -> 404 (ConnSupportUtils.java:642-645),
            # keyed on the ERRORING CONNECTION's domain (the final
            # hop's url) — mirrors the fetch UDF (VERDICT r4 item 8)
            if status == 500 and "handle.net" in (
                url.split("//", 1)[-1].split("/", 1)[0].lower()
            ):
                status = 404
            if 300 <= status <= 399 and status != 304:
                emit(rnd, r["id"], r["url"], "unreachable", "redirect_limit")
                continue
            if not (200 <= status <= 299 or status == 304):
                if status == -1:
                    key = "conn_timeout"
                    bump(r["top3"], "n_timeout")
                elif 400 <= status <= 599:
                    key = f"http_{status}"
                    if 500 <= status <= 599 and status != 503:
                        bump(r["top3"], "n5xx")
                    if status == 403:
                        pk = (r["top3"], dir_path(url))
                        rd_path[pk] = rd_path.get(pk, 0) + 1
                else:
                    # not 2XX/3XX/4XX/5XX: immediate block, no counting,
                    # no exemption (ConnSupportUtils.java:693-705)
                    key = "unknown_code"
                    st.blocked.add(r["top3"])
                emit(rnd, r["id"], r["url"], "unreachable", key)
                continue
            # N8 sniff (mirrors the engine's fetch UDF)
            sniffed_ct = resp["content_type"]
            if sniffed_ct is None:
                body0 = resp.get("html_body")
                if body0 and body0.lstrip().lower().startswith(("<html", "<!doctype")):
                    sniffed_ct = "text/html"
                elif resp.get("body_kind") == "image":
                    sniffed_ct = "image/png"
            # N10 size guards
            if sniffed_ct and "html" in sniffed_ct.lower() and resp["content_length"] > 5 * 1024 * 1024:
                emit(rnd, r["id"], r["url"], "unreachable", "oversize_html")
                continue
            if resp["content_length"] > 512 * 1024 * 1024:
                emit(rnd, r["id"], r["url"], "unreachable", "oversize_fulltext")
                continue
            cat = v.mime_category.get(url)
            if cat is None and resp["body_kind"] == "image":
                cat = "document"
            if cat in ("document", "dataset"):
                if _att:
                    resolved.add(r["id"])
                emit(rnd, r["id"], r["url"], url, None)
                # +1 good for page domain and doc-url domain
                # (UrlUtils.java:113-119)
                bump(r["top3"], "good")
                bump(v.top3.get(url), "good")
                if r.get("phase") == "remaining" and r.get("page_final"):
                    rd_rem_hit_pages.add(r["page_final"])
                # J6 learn (gatherMLData) + A8 found counter
                if use_mla and r.get("page_final") and url != r["page_final"]:
                    _pp2 = v.path.get(r["page_final"])
                    _dp = v.path.get(url)
                    if _pp2 and _dp:
                        rd_pm_pairs.add((_pp2, _dp))
                        rd_mla_gather += 1
                        _did2 = v.docid.get(url)
                        _m = DOC_EXT_RE.search(_did2) if _did2 else None
                        if _m:
                            rd_pm_ext[_dp] = max(
                                rd_pm_ext.get(_dp, ""), _m.group(1)
                            )
                if r.get("phase") == "mla" and r.get("page_final"):
                    rd_mla_found_pages.add(r["page_final"])
                # J7 learn: a verified doc that came via an extracted
                # link stores (page_path, structure)
                if r.get("structure") is not None and r.get("page_final"):
                    pp = v.path.get(r["page_final"])
                    if pp:
                        rd_model.add((pp, r["structure"]))
                continue
            ct = sniffed_ct or ""
            if "html" in ct.lower():
                import re as _re

                from ..functions.htmlparse import (
                    META_ACCESS_RIGHTS,
                    META_DOC_URL,
                    NO_ACCESS_RIGHTS,
                    extract_links_one,
                )

                body = resp.get("html_body") or ""
                m = _re.search(META_DOC_URL, body)
                meta_url = (m.group(1) or m.group(2)) if m else None
                am = _re.search(META_ACCESS_RIGHTS, body)
                rights = (am.group(1) or am.group(2)) if am else None
                if rights and _re.fullmatch(NO_ACCESS_RIGHTS, rights.lower()):
                    if _att:  # successful connect; MetadataHandler stop
                        resolved.add(r["id"])
                    emit(rnd, r["id"], r["url"], "unreachable",
                         "restricted access (meta rights)")
                    continue
                extracted = extract_links_one(body, url)
                if any(x["signal"] == "dynamic" for x in extracted):
                    # DynamicInternalLinksFoundException propagates out
                    # of the visit (PageCrawler.java:610-611) -> the
                    # attempt FAILED, the fallback wave fires
                    emit(rnd, r["id"], r["url"], "unreachable",
                         "dynamic internal links")
                    st.blocked.add(v.top3.get(url) or r["top3"])
                    continue
                if _att:  # page connect succeeded -> id resolved
                    resolved.add(r["id"])
                rd_mla_pages += 1  # live page reached the MLA stage
                # candidates: (pos, link, structure, phase)
                candidates: list[tuple] = []
                if meta_url:
                    candidates.append((0, meta_url, None, "meta"))
                plain = [
                    (pos + 2 + _off, x)
                    for pos, x in enumerate(
                        [y for y in extracted if y["signal"] == "plain"][:MAX_LINKS_PER_PAGE]
                    )
                ]
                # F15 gather-time gate applies to every kept link
                accepted = [
                    (p, x) for p, x in plain if v.link_reject.get(x["link"]) is None
                ]
                # J6 path-MLA prediction (mirrors the engine: a hit
                # suppresses docfound/structure/doclike/remaining)
                mla_cands: list[tuple] = []
                if mla_predict_on:
                    _pp = v.path.get(url)
                    _did = v.docid.get(url)
                    if _did:
                        _did = PLAIN_PAGE_EXT_RE.sub("", _did)
                    _paths = st.path_model.get(_pp) if _pp else None
                    if _did and _paths and len(_paths) <= 5:
                        rd_mla_checked += 1
                        _preds = {
                            p + _did + st.path_ext.get(p, "") for p in _paths
                        }
                        mla_cands = [
                            (1, x["link"], x["structure"], "mla")
                            for _p2, x in accepted if x["link"] in _preds
                        ]
                if mla_cands:
                    candidates.extend(mla_cands)
                else:
                    found = [x for x in extracted if x["signal"] == "docFound"]
                    if found:
                        candidates.append(
                            (1 + _off, found[0]["link"],
                             found[0]["structure"], "docfound")
                        )
                    # J7 structure-MLA hits bypass the 5/10 caps
                    page_path = v.path.get(url)
                    hits = [
                        (p, x) for p, x in accepted
                        if (page_path, x["structure"]) in st.structure_model
                    ]
                    rest = [
                        (p, x) for p, x in accepted
                        if (page_path, x["structure"]) not in st.structure_model
                    ]
                    for p, x in hits:
                        candidates.append((p, x["link"], x["structure"], "structure"))
                    ranked = sorted(
                        rest, key=lambda t: (not v.doc_like[t[1]["link"]], t[0])
                    )
                    for i, (p, x) in enumerate(ranked, start=1):
                        l = x["link"]
                        if v.doc_like[l] and i <= MAX_POSSIBLE_DOC_LINKS:
                            candidates.append((p, l, x["structure"], "doclike"))
                        elif (
                            remaining_on
                            and not v.doc_like[l]
                            and i <= MAX_POSSIBLE_DOC_LINKS + MAX_REMAINING_LINKS
                        ):
                            candidates.append((p, l, x["structure"], "remaining"))
                if any(ph == "remaining" for *_x, ph in candidates):
                    rd_rem_evals += 1
                if not candidates:
                    emit(rnd, r["id"], r["url"], "unreachable", "no docUrl found on page")
                    # PageCrawler counters :314,369 — zero extracted links
                    # vs links-but-none-accepted
                    bump(r["top3"], "n_nolinks" if not extracted else "n_nodocurls")
                else:
                    for p, l, struct, phase in candidates:
                        next_frontier.append(
                            {"id": r["id"], "order_in_id": p, "url": l,
                             "depth": 1, "kind": "internal",
                             "page_final": url, "structure": struct,
                             "phase": phase}
                        )
            else:
                if _att:  # connected fine; returns false, no exception
                    resolved.add(r["id"])
                emit(rnd, r["id"], r["url"], "unreachable", "not a document or page")
                if sniffed_ct is None and resp["content_disposition"] is None:
                    bump(r["top3"], "n_notype")
                else:
                    bump(r["top3"], "n_notdocnorpage")
        # J4 round end: resolved ids surrender their pool (skipped
        # rows); failed ids inject their next pool url as a fallback
        # attempt next round (mirrors the engine's wave)
        failed = attempts - resolved - spilled_ids
        for id_ in sorted(set(st.fallback_pool) & resolved):
            for pr in st.fallback_pool.pop(id_):
                emit(
                    rnd, id_, pr["url"], "unreachable",
                    "Skipped in LoaderAndChecker, as a better url was "
                    f"selected for id: {id_}",
                )
        for id_ in sorted(failed):
            pool_rows = st.fallback_pool.get(id_)
            if pool_rows:
                nxt = pool_rows.pop(0)
                if not pool_rows:
                    del st.fallback_pool[id_]
                next_frontier.append(
                    {"id": id_, "order_in_id": nxt["order_in_id"],
                     "url": nxt["url"], "depth": 0, "kind": "fallback",
                     "page_final": None, "structure": None, "phase": None}
                )
        st.seen |= new_seen
        st.https_domains |= {d for d in rd_https if d}
        st.slash_domains |= {d for d in rd_slash if d}
        st.structure_model |= rd_model
        st.rem_evals += rd_rem_evals
        st.rem_hits += len(rd_rem_hit_pages)
        if use_mla:
            for _ppx, _dpx in rd_pm_pairs:
                st.path_model.setdefault(_ppx, set()).add(_dpx)
            for _dpx, _ex in rd_pm_ext.items():
                st.path_ext[_dpx] = max(st.path_ext.get(_dpx, ""), _ex)
            mla_gate.observe_round(
                gathered=rd_mla_gather, pages_reached=rd_mla_pages,
                checked=rd_mla_checked, found=len(rd_mla_found_pages),
            )
        # round boundary: merge counter deltas, then evaluate the exact
        # A2/A3 rules over the CUMULATIVE counters (latched blocks) —
        # operators/blocking.py has the citations
        for dom, counters in rd_dom.items():
            cum = st.dom_counts.setdefault(dom, {})
            for k, n in counters.items():
                cum[k] = cum.get(k, 0) + n
        for pk, n in rd_path.items():
            st.path_counts[pk] = st.path_counts.get(pk, 0) + n
        for (dom, pth), n in st.path_counts.items():
            if n > THRESH_403_PATH:
                st.blocked_paths.add((dom, pth))
        paths_per_dom: dict[str, int] = {}
        for dom, _pth in st.blocked_paths:
            paths_per_dom[dom] = paths_per_dom.get(dom, 0) + 1
        for dom, n in paths_per_dom.items():
            if n > THRESH_BLOCKED_PATHS_PER_DOMAIN and dom not in EXEMPT_DOMAINS:
                st.blocked.add(dom)
        for dom, cum in st.dom_counts.items():
            if dom in EXEMPT_DOMAINS:
                continue
            good = cum.get("good", 0)
            for counter, n in COUNTER_THRESHOLDS.items():
                bad = cum.get(counter, 0)
                # countAndBlockDomainAfterTimes: bad > N and NOT(bad <= good+N)
                if bad > n and not (bad <= good + n):
                    st.blocked.add(dom)
                    break
        frontier = next_frontier
    # J4 end-of-crawl flush: pool urls whose id never resolved still owe
    # an output row (one row per input record, README.md:19-33); round
    # -1 marks post-crawl emission — mirrors CrawlEngine.crawl
    for id_ in sorted(st.fallback_pool):
        for pr in st.fallback_pool[id_]:
            emit(
                -1, id_, pr["url"], "unreachable",
                "Skipped in LoaderAndChecker, as a better url was "
                f"selected for id: {id_}",
            )
    # attempt rows pending in the never-executed next frontier (mirrors
    # CrawlEngine.crawl's budget-exhausted rows)
    for r in frontier:
        if r["kind"] in ("seed", "fallback"):
            emit(-1, r["id"], r["url"], "unreachable",
                 "Not checked: crawl round budget exhausted")
    return st
