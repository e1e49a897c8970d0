"""The frontier-round crawl engine (SURVEY.md §3.1 Spark lifecycle).

One ROUND = one Spark job over the current frontier slice:

  frontier -> domain gate -> blacklist anti-join -> filter battery ->
  clean/canonicalize/hash -> in-round dedup + seen anti-join (J2) ->
  best-url-per-id (J4, seeds) -> re-cross broadcast join (J3) ->
  special rewrite (P9) -> host-bucket repartition + quota (N5) ->
  fetch mapInPandas (N1-N13, token-bucket politeness, redirect hops) ->
  classify (N9) -> split(results | pages) -> link gate (F15) + caps ->
  new frontier rows -> state merge = one committed snapshot.

This replaces the reference's per-record virtual-thread pipeline
(LoaderAndChecker.loadAndCheckIdUrlPairs, util/url/LoaderAndChecker.java:156-300
-> HttpConnUtils.connectAndCheckMimeType :114-270 -> PageCrawler.visit
crawler/PageCrawler.java:86-292) with round-granular semantics: shared
state (seen set, domain counters, results cache) is only updated at
round boundaries, making the crawl DETERMINISTIC — the reference's
racy cross-thread updates (e.g. countInsertAndGetTimes,
ConnSupportUtils.java:947-957) become per-round aggregates.

Scale design (10^10 frontier):
- frontier partitioned by host_bucket: all URLs of a top-3-domain live
  in ONE task -> politeness needs no locks (replaces the per-domain
  mutex, util/http/DomainConnectionData.java:13).
- per-round per-host quota caps hot hosts; excess rows spill to the
  next round (kills zipf-head skew; the reference instead serializes
  threads on the domain lock).
- seen-check = bloom prefilter + exact anti-join (operators/seen.py).
- re-cross and domain_state joins are broadcast by construction
  (#domains << #urls).
- all counters are groupBy aggregates merged into domain_state.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import filters as FL
from ..functions import htmlparse as H
from ..functions import mime as M
from ..functions import retry as R
from ..functions import urls as U
from ..operators.besturl import pick_best_url_per_id
from ..operators.seen import mark_seen
from ..sources.synthetic_web import SyntheticWeb

#: reference constants
MAX_PAGE_REDIRECTS = 7       # HttpConnUtils.java:68
MAX_LINK_REDIRECTS = 2       # HttpConnUtils.java:69
MAX_POSSIBLE_DOC_LINKS = 5   # PageCrawler.java:58
MAX_REMAINING_LINKS = 10     # PageCrawler.java:62
MAX_LINKS_PER_PAGE = 500     # PageCrawler.java:57
POLITENESS_MS = 3000         # ConnSupportUtils.java:75

RESULT_SCHEMA = (
    "id string, sourceUrl string, pageUrl string, docOrDatasetUrl string, "
    "wasUrlChecked string, wasUrlValid string, "
    "wasDocumentOrDatasetAccessible string, wasDirectLink string, "
    "couldRetry string, fileHash string, fileSize string, mimeType string, "
    "filePath string, error string, round int"
)

FETCH_OUT_SCHEMA = (
    "id string, url string, canon_url string, url_hash long, host string, "
    "host_bucket int, depth int, kind string, fetch_url string, "
    "final_url string, status int, hops int, error_class string, "
    "content_type string, content_disposition string, content_length long, "
    "body_kind string, image_id string, html_body string, "
    "planned_fetch_ms long"
)


NOT_FOUND = {
    "status": 404, "location": None, "content_type": None,
    "content_disposition": None, "content_length": 0,
    "body_kind": "error", "image_id": None, "html_links": [],
}


class _BroadcastResolver:
    """Default fetch surface: a broadcast url->response table. Picklable
    (only the broadcast handle travels); ``__call__`` builds the actual
    resolve function executor-side."""

    def __init__(self, responses_bc):
        self._bc = responses_bc

    def __call__(self):
        responses = self._bc.value  # one deserialize per executor

        def resolve(url: str) -> dict:
            return responses.get(url) or NOT_FOUND

        return resolve


@dataclass
class CrawlState:
    """The engine's catalog — every reference global hash-structure as a
    DataFrame (SURVEY.md §1.3)."""

    results: DataFrame
    seen: DataFrame            # url_hash long
    blocked_domains: DataFrame  # domain string
    frontier: DataFrame | None = None
    payloads: DataFrame | None = None
    metrics: list[dict] = field(default_factory=list)


def _empty(spark: SparkSession, schema: str) -> DataFrame:
    return spark.createDataFrame([], schema)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        web: SyntheticWeb,
        num_buckets: int = 32,
        host_quota: int = 50,
        battery: FL.FilterBattery = FL.DEFAULT_BATTERY,
    ):
        self.spark = spark
        self.web = web
        self.num_buckets = num_buckets
        self.host_quota = host_quota
        self.battery = battery
        # The fetch surface is pluggable: a web exposing
        # ``resolver_factory()`` hands the executors a picklable factory
        # (a live-HTTP client in production; a pure url->response
        # function for web-scale synthetic runs — nothing shipped at
        # all). Otherwise the materialized response table ships ONCE as
        # a broadcast — captured in the closure it would be
        # re-serialized into every task binary (tens of MB x thousands
        # of tasks at bench scale).
        factory = getattr(web, "resolver_factory", None)
        if factory is not None:
            self._make_resolver = factory()
        else:
            self._make_resolver = _BroadcastResolver(
                spark.sparkContext.broadcast(web.responses)
            )
        # small dimension tables reused every round: build + cache once
        self._robots_df = web.robots_df(spark).cache()
        self._payload_meta = web.payloads_df(spark).select(
            "image_id", F.col("phash").alias("_phash"),
            F.length("bytes").alias("_fsize"),
        ).cache()

    # ------------------------------------------------------------------
    # fetch stage: mapInPandas over host-bucketed partitions
    # ------------------------------------------------------------------

    def _fetch_udf(self):
        make_resolver = self._make_resolver  # picklable factory (tiny)

        def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            resolve = make_resolver()  # one construction per task

            # per-host virtual politeness clock: all rows of one host are
            # in this partition (host_bucket repartition), so the token
            # bucket is task-local (N5; no global lock).
            last_fetch_ms: dict[str, int] = {}

            for pdf in batches:
                # deterministic order inside the task: (priority surrogate)
                pdf = pdf.sort_values(["host", "url_hash"], kind="mergesort")
                out_rows = []
                for row in pdf.itertuples(index=False):
                    host = row.host or ""
                    t = last_fetch_ms.get(host, 0)
                    planned = t + POLITENESS_MS if t else 0
                    last_fetch_ms[host] = planned if planned else POLITENESS_MS

                    max_hops = (
                        MAX_PAGE_REDIRECTS if row.kind in ("seed", "redirect")
                        else MAX_LINK_REDIRECTS
                    )
                    url = row.fetch_url
                    hops = 0
                    resp = resolve(url)
                    while resp["status"] in (301, 302, 303, 307, 308):
                        loc = resp["location"]
                        if loc is None or hops >= max_hops:
                            break
                        hops += 1
                        url = loc
                        resp = resolve(url)
                    if resp["status"] in (301, 302, 303, 307, 308):
                        error_class = "redirect_limit"
                    elif resp["status"] == 200:
                        error_class = None
                    elif resp["status"] == -1:
                        error_class = "conn_timeout"
                    else:
                        error_class = f"http_{resp['status']}"

                    # N8: header-less responses get their type sniffed
                    # from the body magic (detectContentTypeFromResponseBody,
                    # ConnSupportUtils.java:1171-1229)
                    content_type = resp["content_type"]
                    if content_type is None and error_class is None:
                        body = resp.get("html_body")
                        if body and body.lstrip().lower().startswith(("<html", "<!doctype")):
                            content_type = "text/html"
                        elif resp.get("body_kind") == "image":
                            content_type = "image/png"
                    out_rows.append({
                        "id": row.id, "url": row.url,
                        "canon_url": row.canon_url, "url_hash": row.url_hash,
                        "host": row.host, "host_bucket": row.host_bucket,
                        "depth": row.depth, "kind": row.kind,
                        "fetch_url": row.fetch_url, "final_url": url,
                        "status": resp["status"], "hops": hops,
                        "error_class": error_class,
                        "content_type": content_type,
                        "content_disposition": resp["content_disposition"],
                        "content_length": resp["content_length"],
                        "body_kind": resp["body_kind"],
                        "image_id": resp["image_id"],
                        "html_body": resp.get("html_body"),
                        "planned_fetch_ms": planned,
                    })
                yield pd.DataFrame(out_rows) if out_rows else pd.DataFrame(
                    columns=[f.split()[0] for f in FETCH_OUT_SCHEMA.split(", ")]
                )

        return fetch

    # ------------------------------------------------------------------

    def prepare_frontier(self, raw: DataFrame, round_no: int) -> DataFrame:
        """Stages 1-9: gate, clean, canonicalize, hash, bucket."""
        url = F.col("url")
        df = raw.withColumn("domain", U.domain_of(url))
        df = df.withColumn("reject_reason", F.when(
            F.col("domain").isNull(), F.lit("domain_unretrievable")
        ).otherwise(
            self.battery.page_url_reject_reason(F.lower(url))
            if round_no == 0
            else self.battery.internal_link_reject_reason(F.lower(url))
        ))
        df = df.withColumn("clean_url", U.clean_url(url))
        df = df.withColumn(
            "canon_url",
            F.when(F.col("reject_reason").isNull(), U.canonicalize_udf(F.col("clean_url"))),
        )
        df = df.withColumn(
            "reject_reason",
            F.when(
                F.col("reject_reason").isNull() & F.col("canon_url").isNull(),
                F.lit("unnormalizable"),
            ).otherwise(F.col("reject_reason")),
        )
        # NOTE xxhash64(NULL) returns the seed (42), not NULL — guard it
        df = df.withColumn(
            "url_hash",
            F.when(F.col("canon_url").isNotNull(), U.url_hash64(F.col("canon_url"))),
        )
        df = df.withColumn("top3", U.top3_domain(F.col("domain")))
        df = df.withColumn("host_bucket", U.host_bucket(F.col("top3"), self.num_buckets))
        return df

    def run_round(self, state: CrawlState, frontier: DataFrame, round_no: int) -> tuple[CrawlState, DataFrame]:
        """Run one round; returns (new state, next-round frontier)."""
        spark = self.spark
        staged = self.prepare_frontier(frontier, round_no).cache()

        rejected = staged.filter(F.col("reject_reason").isNotNull())
        reject_results = rejected.select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.lit("null").alias("pageUrl"),
            F.lit("unreachable").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.lit("null").alias("wasUrlValid"),
            F.lit("false").alias("wasDocumentOrDatasetAccessible"),
            F.lit("false").alias("wasDirectLink"),
            F.lit("false").alias("couldRetry"),
            F.lit("null").alias("fileHash"), F.lit("null").alias("fileSize"),
            F.lit("null").alias("mimeType"), F.lit("null").alias("filePath"),
            F.concat(F.lit("Discarded: "), F.col("reject_reason")).alias("error"),
            F.lit(round_no).alias("round"),
        )

        ok = staged.filter(F.col("reject_reason").isNull())

        # in-round dedup (first occurrence by deterministic order) + J2.
        # Cached: this window output fans out to BOTH the dup log and the
        # survivor path — without the cache every downstream action would
        # re-run the shuffle+sort (Spark shares no subplans across
        # actions; see the fan-out caches below for the same reason).
        _round_caches = [staged]
        w = Window.partitionBy("url_hash").orderBy("order_in_id", "id")
        ok = ok.withColumn("_rn", F.row_number().over(w)).cache()
        _round_caches.append(ok)
        in_round_dups = ok.filter(F.col("_rn") > 1)
        ok = ok.filter(F.col("_rn") == 1).drop("_rn")
        seen_count = state.metrics[-1]["seen_total"] if state.metrics else 0
        marked = mark_seen(ok, state.seen, "url_hash", seen_count=seen_count).cache()
        _round_caches.append(marked)
        unseen = marked.filter(~F.col("_seen")).drop("_seen")
        cross_round_dups = marked.filter(F.col("_seen")).drop("_seen")
        dup_results = in_round_dups.drop("_rn").unionByName(cross_round_dups).select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.lit("null").alias("pageUrl"),
            F.lit("duplicate").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.lit("null").alias("wasUrlValid"),
            F.lit("null").alias("wasDocumentOrDatasetAccessible"),
            F.lit("null").alias("wasDirectLink"),
            F.lit("true").alias("couldRetry"),
            F.lit("null").alias("fileHash"), F.lit("null").alias("fileSize"),
            F.lit("null").alias("mimeType"), F.lit("null").alias("filePath"),
            F.lit("duplicate url").alias("error"),
            F.lit(round_no).alias("round"),
        )

        # J4: best-url-per-id (seed rounds group by id)
        if round_no == 0:
            picked = pick_best_url_per_id(unseen).filter(F.col("is_best")).drop("is_best")
        else:
            picked = unseen.withColumn("priority", F.lit(0))

        # J3: re-cross against prior results (broadcast — results' doc urls)
        # deterministic owner per doc-url: min id wins (the reference's
        # owner is whichever thread won the race — we define it).
        prior_docs = (
            state.results.filter(
                ~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")
            )
            .groupBy(F.col("docOrDatasetUrl").alias("_hit_url"))
            .agg(
                F.min("id").alias("_orig_id"),
                F.min_by("mimeType", "id").alias("_orig_mime"),
            )
        )
        crossed = picked.join(
            F.broadcast(prior_docs),
            picked["canon_url"] == prior_docs["_hit_url"],
            "left",
        ).cache()  # fan-out: re-cross hits + the to-fetch remainder
        _round_caches.append(crossed)
        recross_hits = crossed.filter(F.col("_orig_id").isNotNull())
        recross_results = recross_hits.select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.col("url").alias("pageUrl"),
            F.col("canon_url").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.lit("true").alias("wasUrlValid"),
            F.lit("true").alias("wasDocumentOrDatasetAccessible"),
            F.lit("true").alias("wasDirectLink"),
            F.lit("true").alias("couldRetry"),
            F.lit("null").alias("fileHash"), F.lit("null").alias("fileSize"),
            F.coalesce(F.col("_orig_mime"), F.lit("null")).alias("mimeType"),
            F.concat(F.lit("already retrieved by "), F.col("_orig_id")).alias("filePath"),
            F.lit("null").alias("error"),
            F.lit(round_no).alias("round"),
        )
        to_fetch = crossed.filter(F.col("_orig_id").isNull()).drop(
            "_hit_url", "_orig_id", "_orig_mime"
        )

        # P9 + blacklist + quota, then the physical move: one host -> one task
        to_fetch = U.with_special_rewrite(to_fetch, "canon_url", "fetch_url")
        # blocks are recorded at top-3-domain granularity (politeness key)
        to_fetch = to_fetch.join(
            F.broadcast(state.blocked_domains),
            on=to_fetch["top3"] == state.blocked_domains["domain"],
            how="left_anti",
        )

        # robots gate (north rule; no reference equivalent): broadcast
        # robots_rules(domain, disallow[]) joined on host; a fetch_url
        # whose path starts with a disallowed prefix is dropped with a
        # result row instead of fetched.
        robots = self._robots_df
        to_fetch = to_fetch.join(
            F.broadcast(robots), to_fetch["top3"] == robots["domain"], "left"
        ).drop(robots["domain"])
        path = F.regexp_replace(F.col("fetch_url"), "^https?://[^/]*", "")
        disallowed = F.when(
            F.col("disallow").isNotNull(),
            F.exists("disallow", lambda pre: path.startswith(pre)),
        ).otherwise(F.lit(False))
        robots_blocked = to_fetch.filter(disallowed)
        robots_results = robots_blocked.select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.lit("null").alias("pageUrl"),
            F.lit("unreachable").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.lit("true").alias("wasUrlValid"),
            F.lit("false").alias("wasDocumentOrDatasetAccessible"),
            F.lit("false").alias("wasDirectLink"),
            F.lit("false").alias("couldRetry"),
            F.lit("null").alias("fileHash"), F.lit("null").alias("fileSize"),
            F.lit("null").alias("mimeType"), F.lit("null").alias("filePath"),
            F.lit("robots disallowed").alias("error"),
            F.lit(round_no).alias("round"),
        )
        to_fetch = to_fetch.filter(~disallowed).drop("disallow")
        wq = Window.partitionBy("top3").orderBy("priority", "url_hash")
        # fan-out: quota survivors -> fetch, excess -> next-round spill
        to_fetch = to_fetch.withColumn("_hq", F.row_number().over(wq)).cache()
        _round_caches.append(to_fetch)
        spill = to_fetch.filter(F.col("_hq") > self.host_quota).drop("_hq")
        to_fetch = to_fetch.filter(F.col("_hq") <= self.host_quota).drop("_hq")

        fetch_in = to_fetch.select(
            "id", "url", "canon_url", "url_hash",
            F.col("top3").alias("host"), "host_bucket", "depth", "kind",
            "fetch_url",
        ).repartition(self.num_buckets, "host_bucket")
        fetched = fetch_in.mapInPandas(self._fetch_udf(), schema=FETCH_OUT_SCHEMA).cache()

        # N10: content-size guards (html <= 5MB, fulltext <= 512MB,
        # HttpConnUtils.java:73-74) — oversize rows become errors
        MAX_HTML = 5 * 1024 * 1024
        MAX_FULLTEXT = 512 * 1024 * 1024
        fetched = fetched.withColumn(
            "error_class",
            F.when(
                F.col("error_class").isNull()
                & M.is_html_mime(F.col("content_type"))
                & (F.col("content_length") > MAX_HTML),
                F.lit("oversize_html"),
            )
            .when(
                F.col("error_class").isNull()
                & (F.col("content_length") > MAX_FULLTEXT),
                F.lit("oversize_fulltext"),
            )
            .otherwise(F.col("error_class")),
        )

        # N9 classification on fetch results (native columns)
        classified = fetched.withColumn(
            "mime_res",
            M.classify_mime(
                F.col("final_url"), F.col("content_type"), F.col("content_disposition")
            ),
        ).withColumn(
            "category",
            F.when(F.col("error_class").isNotNull(), "error")
            .when(
                F.col("mime_res.mime_category").isNotNull()
                | (F.col("body_kind") == "image"),
                F.coalesce(F.col("mime_res.mime_category"), F.lit("document")),
            )
            .when(M.is_html_mime(F.col("content_type")), "page")
            .otherwise("other"),
        )

        # doc/error/other fetch outcomes in ONE pass (a single select with
        # when-chains instead of three branch plans — one scan of the
        # cached fetch output instead of three, and a third of the plan
        # surface for Catalyst to analyze per action)
        payload_meta = self._payload_meta
        classified = classified.join(F.broadcast(payload_meta), "image_id", "left")
        docs = classified.filter(F.col("category").isin("document", "dataset"))
        is_doc = F.col("category").isin("document", "dataset")
        is_err = F.col("category") == "error"
        err_struct = R.was_valid_and_could_retry(F.col("error_class"), F.col("final_url"))
        fetch_results = classified.filter(
            F.col("category").isin("document", "dataset", "error", "other")
        ).select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.col("url").alias("pageUrl"),
            F.when(is_doc, F.col("final_url")).otherwise("unreachable").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.when(is_err, err_struct["wasUrlValid"]).otherwise("true").alias("wasUrlValid"),
            F.when(is_doc, "true").otherwise("false").alias("wasDocumentOrDatasetAccessible"),
            F.when(is_doc & (F.col("hops") == 0), "true").otherwise("false").alias("wasDirectLink"),
            F.when(is_doc, "true").when(is_err, err_struct["couldRetry"]).otherwise("false").alias("couldRetry"),
            F.when(is_doc, F.coalesce(F.col("_phash").cast("string"), F.lit("null"))).otherwise("null").alias("fileHash"),
            F.when(is_doc, F.coalesce(F.col("_fsize").cast("string"), F.lit("null"))).otherwise("null").alias("fileSize"),
            F.when(is_doc, F.coalesce(F.col("mime_res.plain_mime"), F.col("content_type"), F.lit("null")))
            .when(is_err, "null")
            .otherwise(F.coalesce(F.col("content_type"), F.lit("null"))).alias("mimeType"),
            F.when(is_doc, F.coalesce(F.col("image_id"), F.lit("null"))).otherwise("null").alias("filePath"),
            F.when(is_err, err_struct["error_msg"])
            .when(is_doc, "null")
            .otherwise("not a document or page").alias("error"),
            F.lit(round_no).alias("round"),
        )

        # pages -> G5 metadata scan + G3 extraction UDF + G9 ranking
        pages = classified.filter(F.col("category") == "page").withColumn(
            "_meta_url",
            H.localhost_fix(
                H.meta_doc_url(F.col("html_body")), U.domain_of(F.col("final_url"))
            ),
        ).withColumn(
            "_restricted", H.meta_access_restricted(F.col("html_body"))
        ).withColumn(
            "_links", H.extract_links_udf(F.col("html_body"), F.col("final_url"))
        ).cache()

        # dynamic-link pages block their domain (F13,
        # DynamicInternalLinksFoundException, PageCrawler.java:610-611)
        has_dynamic = F.exists("_links", lambda x: x["signal"] == "dynamic")
        dynamic_pages = pages.filter(~F.col("_restricted")).filter(has_dynamic)
        dynamic_blocked = dynamic_pages.select(
            U.top3_domain(U.domain_of(F.col("final_url"))).alias("domain")
        ).distinct()
        # live pages continue into link extraction; restricted-access
        # pages stop (MetadataHandler.java:77-120)
        live = pages.filter(~F.col("_restricted")).filter(~has_dynamic)

        # candidates, ranked per G9: meta docUrl (rank 0) > docFound
        # signal (rank 1) > possible-doc links (<=5) > remaining (<=10)
        meta_c = live.filter(F.col("_meta_url").isNotNull()).select(
            F.col("id"), F.col("url").alias("page_url"),
            F.lit(0).alias("pos"), F.col("_meta_url").alias("link"),
        )
        doc_found = live.select(
            F.col("id"), F.col("url").alias("page_url"),
            F.lit(1).alias("pos"),
            F.try_element_at(
                F.filter("_links", lambda x: x["signal"] == "docFound"), F.lit(1)
            )["link"].alias("link"),
        ).filter(F.col("link").isNotNull())

        plain = live.select(
            F.col("id"), F.col("url").alias("page_url"),
            F.posexplode(
                F.slice(
                    F.filter("_links", lambda x: x["signal"] == "plain"),
                    1, MAX_LINKS_PER_PAGE,
                )
            ).alias("pos", "l"),
        ).select(
            "id", "page_url", (F.col("pos") + 2).alias("pos"),
            F.col("l")["link"].alias("link"),
        )
        plain = plain.withColumn(
            "link_reject", self.battery.internal_link_reject_reason(F.lower(F.col("link")))
        ).filter(F.col("link_reject").isNull()).drop("link_reject")
        plain = plain.withColumn(
            "is_doc_like",
            FL.is_possible_doc_url(F.lower(F.col("link")))
            | FL.is_possible_dataset_url(F.lower(F.col("link"))),
        )
        wl = Window.partitionBy("page_url").orderBy(
            F.col("is_doc_like").desc(), F.col("pos")
        )
        plain = plain.withColumn("_lr", F.row_number().over(wl))
        plain = plain.filter(
            (F.col("is_doc_like") & (F.col("_lr") <= MAX_POSSIBLE_DOC_LINKS))
            | (~F.col("is_doc_like") & (F.col("_lr") <= MAX_POSSIBLE_DOC_LINKS + MAX_REMAINING_LINKS))
        ).drop("is_doc_like", "_lr")

        # fan-out: next-round frontier + "page yielded nothing" anti-join
        links = meta_c.unionByName(doc_found).unionByName(plain).cache()
        _round_caches.append(links)
        next_frontier = links.select(
            F.col("id"),
            F.col("pos").cast("long").alias("order_in_id"),
            F.col("link").alias("url"),
            F.lit(1).alias("depth"),
            F.lit("internal").alias("kind"),
        )
        # spilled rows re-enter untouched next round
        spill_frontier = spill.select(
            "id", "order_in_id", "url", "depth", "kind"
        )
        next_frontier = next_frontier.unionByName(spill_frontier)

        # all page terminal outcomes in ONE pass over the cached pages:
        # restricted (MetadataHandler stop), dynamic (domain trap), and
        # "no accepted candidate links" -> one tagged select instead of
        # three branch plans + an anti-join
        linked = links.select("page_url").distinct().withColumn("_has_link", F.lit(True))
        page_tagged = pages.join(
            linked, pages["url"] == linked["page_url"], "left"
        ).drop("page_url")
        page_outcome = (
            F.when(F.col("_restricted"), "restricted")
            .when(has_dynamic, "dynamic")
            .when(F.col("_has_link").isNull(), "nolink")
        )
        page_results = page_tagged.withColumn("_po", page_outcome).filter(
            F.col("_po").isNotNull()
        ).select(
            F.col("id"), F.col("url").alias("sourceUrl"),
            F.col("final_url").alias("pageUrl"),
            F.lit("unreachable").alias("docOrDatasetUrl"),
            F.lit("true").alias("wasUrlChecked"),
            F.lit("true").alias("wasUrlValid"),
            F.lit("false").alias("wasDocumentOrDatasetAccessible"),
            F.lit("false").alias("wasDirectLink"),
            F.when(F.col("_po") == "dynamic", "true").otherwise("false").alias("couldRetry"),
            F.lit("null").alias("fileHash"), F.lit("null").alias("fileSize"),
            F.lit("null").alias("mimeType"), F.lit("null").alias("filePath"),
            F.when(F.col("_po") == "restricted", "restricted access (meta rights)")
            .when(F.col("_po") == "dynamic", "dynamic internal links")
            .otherwise("no docUrl found on page").alias("error"),
            F.lit(round_no).alias("round"),
        )

        new_results = (
            reject_results.unionByName(dup_results)
            .unionByName(recross_results)
            .unionByName(fetch_results)
            .unionByName(robots_results)
            .unionByName(page_results)
        )

        # payload table: J5 dedup by phash (row_number over fetch order)
        new_payloads = docs.filter(F.col("image_id").isNotNull()).select("image_id").distinct()

        # seen update: every checked url enters the seen set
        new_seen = state.seen.unionByName(
            staged.filter(F.col("url_hash").isNotNull()).select("url_hash")
        ).unionByName(
            fetched.select(U.url_hash64(F.col("final_url")).alias("url_hash"))
        ).distinct()

        # A2-style domain blocking from per-round aggregates
        bad = fetched.filter(
            F.col("error_class").rlike("^http_5..$") | (F.col("error_class") == "conn_timeout")
        ).groupBy("host").agg(F.count(F.lit(1)).alias("bad"))
        newly_blocked = bad.filter(F.col("bad") > 10).select(F.col("host").alias("domain"))
        blocked = (
            state.blocked_domains.unionByName(newly_blocked)
            .unionByName(dynamic_blocked)
            .distinct()
        )

        new_state = CrawlState(
            results=state.results.unionByName(new_results),
            seen=new_seen,
            blocked_domains=blocked,
            payloads=(
                new_payloads if state.payloads is None
                else state.payloads.unionByName(new_payloads).distinct()
            ),
            metrics=state.metrics,
        )

        def finalize_metrics(seen_total: int, results_count: int) -> None:
            """Append this round's lineage AFTER the round's tables have
            been materialized (checkpoint/snapshot). Everything here
            reads only the cached intermediates (one fused aggregation
            per table), so metrics never force a recompute of the round
            plan — the driver's action count per round stays minimal.

            Per-partition lineage (north rule): frontier offsets and
            fetch/error counters per host_bucket + seen cardinality."""
            # ``results_count`` arrives CUMULATIVE (count of the
            # materialized results table); the per-round delta falls out
            # of the previous rounds' recorded deltas.
            prev_total = sum(m["results"] for m in state.metrics)
            staged_agg = (
                staged.groupBy("host_bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("reject_reason").isNotNull().cast("int")).alias("rej"),
                )
                .collect()
            )
            fetch_agg = (
                fetched.groupBy("host_bucket")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("error_class").isNotNull().cast("int")).alias("errs"),
                )
                .collect()
            )
            state.metrics.append({
                "round": round_no,
                "frontier_in": sum(r["n"] for r in staged_agg),
                "rejected": sum(r["rej"] or 0 for r in staged_agg),
                "fetched": sum(r["n"] for r in fetch_agg),
                "results": results_count - prev_total,
                "seen_total": seen_total,
                "frontier_offsets": {str(r["host_bucket"]): r["n"] for r in staged_agg},
                "fetch_counters": {
                    str(r["host_bucket"]): {"fetched": r["n"], "errors": r["errs"]}
                    for r in fetch_agg
                },
            })
            for df in _round_caches + [fetched, pages]:
                df.unpersist()

        return new_state, next_frontier, finalize_metrics

    def crawl(
        self,
        seeds: DataFrame | None,
        max_rounds: int = 3,
        catalog=None,
        resume: bool = False,
    ) -> CrawlState:
        """Run the round loop. With ``catalog`` set, every round commits
        one snapshot (tables + lineage); ``resume=True`` restores the
        latest snapshot and continues exactly where it stopped —
        byte-identical to an uninterrupted run (tested)."""
        spark = self.spark
        start_round = 0
        if resume:
            manifest, tables = catalog.load(spark)
            state = CrawlState(
                results=tables["results"].cache(),
                seen=tables["seen"].cache(),
                blocked_domains=tables["blocked_domains"],
                payloads=tables.get("payloads"),
                metrics=manifest["lineage"].get("rounds", []),
            )
            frontier = tables["frontier"]
            start_round = manifest["round"] + 1
        else:
            state = CrawlState(
                results=_empty(spark, RESULT_SCHEMA),
                seen=_empty(spark, "url_hash long"),
                blocked_domains=_empty(spark, "domain string"),
            )
            frontier = seeds.withColumn("depth", F.lit(0)).withColumn(
                "kind", F.lit("seed")
            )
        for rnd in range(start_round, max_rounds):
            if frontier.isEmpty():
                break
            state, frontier, finalize = self.run_round(state, frontier, rnd)
            # LINEAGE TRUNCATION at the round boundary: without it each
            # round's plan nests the whole previous round's DAG and
            # analysis/codegen time grows super-linearly with rounds.
            # With a catalog the committed snapshot IS the cut (state is
            # re-read from the immutable files — exactly what a resumed
            # job would see); without one, localCheckpoint materializes
            # to executor storage. Materialization happens BEFORE any
            # metric is computed, so each round's plan executes exactly
            # once; metrics then read only materialized tables and the
            # cached intermediates (fused single-pass aggregates).
            if catalog is not None:
                tables = {
                    "results": state.results,
                    "seen": state.seen,
                    "blocked_domains": state.blocked_domains,
                    "frontier": frontier,
                }
                if state.payloads is not None:
                    tables["payloads"] = state.payloads
                snap_id, table_meta, loaded = catalog.write_tables(
                    spark, tables, warm_first="results"
                )
                state = CrawlState(
                    results=loaded["results"],
                    seen=loaded["seen"],
                    blocked_domains=loaded["blocked_domains"],
                    payloads=loaded.get("payloads"),
                    metrics=state.metrics,
                )
                frontier = loaded["frontier"]
                finalize(
                    seen_total=table_meta["seen"]["rows"],
                    results_count=table_meta["results"]["rows"],
                )
                catalog.finish_commit(
                    snap_id, table_meta, rnd,
                    {"rounds": state.metrics, "last": state.metrics[-1]},
                )
            else:
                # the five truncations are independent Spark jobs over
                # mostly-cached parents — run them concurrently (the
                # scheduler interleaves their stages; wall time becomes
                # max() instead of sum())
                # results first and alone: it reads EVERY fan-out cache,
                # so this one job materializes them; the remaining cuts
                # then run concurrently against warm caches (running all
                # five at once would race to compute the same cold cache
                # partitions and duplicate the round's work per job)
                cut = {"results": state.results.localCheckpoint(eager=True)}
                to_cut = {
                    "seen": state.seen,
                    "blocked_domains": state.blocked_domains,
                    "frontier": frontier,
                }
                if state.payloads is not None:
                    to_cut["payloads"] = state.payloads
                with ThreadPoolExecutor(max_workers=len(to_cut)) as pool:
                    cut.update(
                        zip(
                            to_cut,
                            pool.map(
                                lambda df: df.localCheckpoint(eager=True),
                                to_cut.values(),
                            ),
                        )
                    )
                state = CrawlState(
                    results=cut["results"],
                    seen=cut["seen"],
                    blocked_domains=cut["blocked_domains"],
                    payloads=cut.get("payloads"),
                    metrics=state.metrics,
                )
                frontier = cut["frontier"]
                finalize(
                    seen_total=state.seen.count(),
                    results_count=state.results.count(),
                )
        state.frontier = frontier
        return state
