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
    fetch_url: dict[str, str]         # canon -> P9-rewritten
    doc_like: dict[str, bool]
    mime_category: dict[str, str | None]  # final_url -> document/dataset/None


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
    ).collect()
    v = Verdicts({}, {}, {}, {}, {}, {}, {}, {})
    for r in rows:
        u = r["url"]
        v.page_reject[u] = r["pr"]
        v.link_reject[u] = r["lr"]
        v.canon[u] = r["canon"]
        v.url_hash[u] = r["h"]
        v.top3[u] = r["top3"]
        v.fetch_url[u] = r["fetch_url"]
        v.doc_like[u] = bool(r["dl"])

    # mime classification per response url (engine computes it on the
    # redirect-resolved final_url's response record)
    resp_urls = sorted(web.responses)
    rdf = spark.createDataFrame(
        [
            (u, web.responses[u]["content_type"], web.responses[u]["content_disposition"])
            for u in resp_urls
        ],
        ["url", "ct", "cd"],
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


@dataclass
class OracleState:
    results: list[dict] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)
    order_log: list[tuple] = field(default_factory=list)


def crawl_oracle(
    web: SyntheticWeb,
    verdicts: Verdicts,
    seeds: list[tuple[str, int, str]],
    max_rounds: int = 3,
    host_quota: int = 50,
) -> OracleState:
    """seeds: (id, order_in_id, url)."""
    v = verdicts
    st = OracleState()
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
        # stage: gate + canon
        staged = []
        for row in frontier:
            u = row["url"]
            reject = (
                "domain_unretrievable" if v.top3.get(u) is None and v.canon.get(u) is None and v.page_reject.get(u) is None and v.link_reject.get(u) is None
                else (v.page_reject[u] if rnd == 0 else v.link_reject[u])
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
                    rank = (
                        0 if v.doc_like[u]
                        else 1 if "/handle/" in u
                        else 2 if "doi.org" not in u
                        else 3
                    )
                    if rank == 0 and best_rank != 0:
                        best, best_rank = r, 0
                    elif rank != 0 and rank <= best_rank and best_rank != 0:
                        best, best_rank = r, rank
                    elif rank < best_rank:
                        best, best_rank = r, rank
                picked.append(best)
        else:
            picked = unseen
        # re-cross vs prior results (min-id owner)
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
            else:
                to_fetch.append(r)
        # blacklist + robots + quota
        to_fetch = [r for r in to_fetch if r["top3"] not in st.blocked]
        allowed = []
        for r in to_fetch:
            fetch_u = v.fetch_url.get(r["url"], r["canon"])
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
        # fetch: deterministic order (host, url_hash)
        fetch_now.sort(key=lambda r: (r["top3"], r["hash"]))
        host_errors: dict[str, int] = {}
        next_frontier = [
            {"id": r["id"], "order_in_id": r["order_in_id"], "url": r["url"],
             "depth": r["depth"], "kind": r["kind"]}
            for r in spill
        ]
        for r in fetch_now:
            st.order_log.append((rnd, r["top3"], r["hash"]))
            max_hops = MAX_PAGE_REDIRECTS if r["kind"] in ("seed", "redirect") else MAX_LINK_REDIRECTS
            url = v.fetch_url[r["url"]] if r["url"] in v.fetch_url else r["canon"]
            url = v.fetch_url.get(r["url"], r["canon"])
            hops = 0
            resp = web.resolve(url)
            while resp["status"] in (301, 302, 303, 307, 308) and resp["location"] and hops < max_hops:
                hops += 1
                url = resp["location"]
                resp = web.resolve(url)
            if xxh(url) is not None:
                new_seen.add(xxh(url))
            if resp["status"] in (301, 302, 303, 307, 308):
                emit(rnd, r["id"], r["url"], "unreachable", "redirect_limit")
                continue
            if resp["status"] != 200:
                key = "conn_timeout" if resp["status"] == -1 else f"http_{resp['status']}"
                if resp["status"] == -1 or 500 <= resp["status"] <= 599:
                    host_errors[r["top3"]] = host_errors.get(r["top3"], 0) + 1
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
                emit(rnd, r["id"], r["url"], url, None)
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
                    emit(rnd, r["id"], r["url"], "unreachable",
                         "restricted access (meta rights)")
                    continue
                extracted = extract_links_one(body, url)
                if any(x["signal"] == "dynamic" for x in extracted):
                    emit(rnd, r["id"], r["url"], "unreachable",
                         "dynamic internal links")
                    st.blocked.add(v.top3.get(url) or r["top3"])
                    continue
                candidates: list[tuple[int, str]] = []
                if meta_url:
                    candidates.append((0, meta_url))
                found = [x["link"] for x in extracted if x["signal"] == "docFound"]
                if found:
                    candidates.append((1, found[0]))
                plain = [
                    (pos + 2, x["link"])
                    for pos, x in enumerate(
                        [y for y in extracted if y["signal"] == "plain"][:MAX_LINKS_PER_PAGE]
                    )
                ]
                accepted = [
                    (p, l) for p, l in plain if v.link_reject.get(l) is None
                ]
                ranked = sorted(accepted, key=lambda t: (not v.doc_like[t[1]], t[0]))
                for i, (p, l) in enumerate(ranked, start=1):
                    if v.doc_like[l] and i <= MAX_POSSIBLE_DOC_LINKS:
                        candidates.append((p, l))
                    elif not v.doc_like[l] and i <= MAX_POSSIBLE_DOC_LINKS + MAX_REMAINING_LINKS:
                        candidates.append((p, l))
                if not candidates:
                    emit(rnd, r["id"], r["url"], "unreachable", "no docUrl found on page")
                else:
                    for p, l in candidates:
                        next_frontier.append(
                            {"id": r["id"], "order_in_id": p, "url": l,
                             "depth": 1, "kind": "internal"}
                        )
            else:
                emit(rnd, r["id"], r["url"], "unreachable", "not a document or page")
        st.seen |= new_seen
        for host, n in host_errors.items():
            if n > 10:
                st.blocked.add(host)
        frontier = next_frontier
    return st
