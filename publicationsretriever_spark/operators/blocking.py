"""A2/A3/A4: exact domain & path blocking rules.

Reference semantics (util/http/ConnSupportUtils.java):

- ``countAndBlockDomainAfterTimes`` (:924-944): a domain is blocked when
  a per-error-type counter crosses its threshold N **unless**
  ``good + N >= bad`` (the doc-hit "buffer zone") or the domain is in
  the never-block set {zenodo.org, doi.org, dx.doi.org} (:902-909).
- Per-error-type counters & thresholds:
  5XX (503 exempt from counting, 511 included) > 10 (:87-89),
  timeouts > 25 (:90), no-content-type > 10 (:92 via :1214),
  input-not-doc-nor-page > 10 (HttpConnUtils.java:71,225),
  page-gave-no-docUrls > 100, page-gave-no-internal-links > 200
  (crawler/PageCrawler.java:52-53,314,369).
- Good hits: ``UrlUtils.domainsAndNumHits`` (+1 for the page domain AND
  +1 for the doc-url domain on every emitted docUrl row,
  util/url/UrlUtils.java:113-119).
- 403 path rule (:800-846): a (domain, path-prefix) pair that returned
  403 more than 10 times blocks that path; a domain with more than 50
  blocked paths is blocked entirely (never-block set still applies; no
  good-offset on this one).
- Unknown status codes (not 2XX/3XX/4XX/5XX) block the domain
  IMMEDIATELY, with no counting and no exemption (:693-705).
- handle.net 500s are demoted to 404 before any counting (:642-645).

Engine semantics are ROUND-GRANULAR (the deliberate determinism cleanup
documented in plans/rounds.py): counters accumulate per round, the rules
are evaluated once at each round boundary over the cumulative counters,
and a block takes effect from the next round. Blocks are latched
(monotone) exactly like the reference's blacklist sets.

Scale note: ``domain_counts``/``path_counts`` are dimension tables
(#domains << #urls). The per-round merge is a groupBy over
(cumulative ∪ delta) — a small shuffle — and every consumer joins them
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: never-block set — ConnSupportUtils.java:902-909
EXEMPT_DOMAINS = ("zenodo.org", "doi.org", "dx.doi.org")

#: thresholds — ConnSupportUtils.java:84-92, HttpConnUtils.java:71,
#: PageCrawler.java:52-53
THRESH_5XX = 10
THRESH_TIMEOUT = 25
THRESH_NOTYPE = 10
THRESH_NOT_DOC_NOR_PAGE = 10
THRESH_NO_DOC_URLS = 100
THRESH_NO_INTERNAL_LINKS = 200
THRESH_403_PATH = 10
THRESH_BLOCKED_PATHS_PER_DOMAIN = 50

DOMAIN_COUNTS_SCHEMA = (
    "domain string, n5xx long, n_timeout long, n_notype long, "
    "n_notdocnorpage long, n_nodocurls long, n_nolinks long, good long"
)
PATH_COUNTS_SCHEMA = "domain string, path string, n403 long"

_COUNTER_COLS = (
    "n5xx", "n_timeout", "n_notype", "n_notdocnorpage",
    "n_nodocurls", "n_nolinks", "good",
)


def dir_path(url_col) -> F.Column:
    """The reference's ``UrlUtils.getPathStr`` — the url prefix up to
    and including the last '/', computed AFTER stripping one trailing
    '/' like getUrlMatcher does (util/url/UrlUtils.java:216-233, "If
    the url ends with '/' then remove it as it's a mistake"): 403s
    from '.../a/b' and '.../a/b/' must accumulate under ONE path key
    or each variant needs its own threshold's worth of errors before
    the A3 block fires. Mirrored by crawl/oracle.dir_path."""
    u = F.regexp_replace(url_col, r"/$", "")
    return F.regexp_extract(u, r"^(.*/)[^/]*$", 1)


def merge_domain_counts(cumulative: DataFrame, delta: DataFrame) -> DataFrame:
    """Cumulative counters += this round's delta (both dimension-sized)."""
    return (
        cumulative.unionByName(delta)
        .groupBy("domain")
        .agg(*[F.sum(c).alias(c) for c in _COUNTER_COLS])
    )


def merge_path_counts(cumulative: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        cumulative.unionByName(delta)
        .groupBy("domain", "path")
        .agg(F.sum("n403").alias("n403"))
    )


def _offends(bad: F.Column, n: int) -> F.Column:
    """countAndBlockDomainAfterTimes core: bad > N and NOT(good+N >= bad)."""
    good = F.coalesce(F.col("good"), F.lit(0))
    b = F.coalesce(bad, F.lit(0))
    return (b > n) & ~(b <= (good + n))


def eval_blocked_paths(path_counts: DataFrame) -> DataFrame:
    """(domain, path) pairs blocked by the >10-403s rule."""
    return path_counts.filter(F.col("n403") > THRESH_403_PATH).select("domain", "path")


def eval_blocked_domains(
    domain_counts: DataFrame, blocked_paths: DataFrame
) -> DataFrame:
    """All domains the cumulative counters currently condemn (callers
    latch the result by unioning into the running blocked set)."""
    not_exempt = ~F.col("domain").isin(*EXEMPT_DOMAINS)
    by_counts = domain_counts.filter(
        not_exempt
        & (
            _offends(F.col("n5xx"), THRESH_5XX)
            | _offends(F.col("n_timeout"), THRESH_TIMEOUT)
            | _offends(F.col("n_notype"), THRESH_NOTYPE)
            | _offends(F.col("n_notdocnorpage"), THRESH_NOT_DOC_NOR_PAGE)
            | _offends(F.col("n_nodocurls"), THRESH_NO_DOC_URLS)
            | _offends(F.col("n_nolinks"), THRESH_NO_INTERNAL_LINKS)
        )
    ).select("domain")
    by_paths = (
        blocked_paths.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(
            (F.col("n") > THRESH_BLOCKED_PATHS_PER_DOMAIN)
            & ~F.col("domain").isin(*EXEMPT_DOMAINS)
        )
        .select("domain")
    )
    return by_counts.unionByName(by_paths).distinct()
