"""URL algebra — canonicalization, triple-split, rewrites (SURVEY.md §2.2).

Design: everything that the reference does per-row with java.util.regex
(`util/url/UrlUtils.java`, `util/url/LoaderAndChecker.java:590-647`,
`crawler/SpecialUrlsHandler.java:38-446`) is expressed as native Catalyst
column expressions (``regexp_replace`` / ``regexp_extract`` / ``when``)
so the whole URL pipeline stays inside WholeStageCodegen — zero Python in
the hot path. Only the full RFC-3986 normalization pass (the reference
uses crawler-commons ``BasicURLNormalizer``) is a vectorized Arrow UDF,
because percent-encoding + dot-segment removal is not regex-expressible.

Spark's regexp_* run java.util.regex, so the extracted reference pattern
strings apply verbatim (Java dialect, bounded lookbehinds included).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import _reference_patterns as P

# ---------------------------------------------------------------------------
# P2/P3: URL triple split (util/url/UrlUtils.java:29,137-233)
# group 1 = path (incl. scheme+domain+dirs), group 2 = domain, group 3 = docId
# ---------------------------------------------------------------------------

# java.util.regex is case-sensitive by default; the reference compiles
# URL_TRIPLE with CASE_INSENSITIVE.
_TRIPLE = "(?i)" + P.URL_TRIPLE


def _strip_trailing_slash(url: Column) -> Column:
    # UrlUtils.getUrlMatcher() strips one trailing "/" before matching
    # (util/url/UrlUtils.java:216-233).
    return F.regexp_replace(url, "/$", "")


def domain_of(url: Column) -> Column:
    """Lowercased domain (UrlUtils.getDomainStr, UrlUtils.java:137-153).
    NULL when the URL doesn't match URL_TRIPLE (reference returns null)."""
    d = F.regexp_extract(_strip_trailing_slash(url), _TRIPLE, 2)
    return F.when(d != "", F.lower(d))


def path_of(url: Column) -> Column:
    """URL path incl. scheme+host+dirs (getPathStr, UrlUtils.java:162-178)."""
    p = F.regexp_extract(_strip_trailing_slash(url), _TRIPLE, 1)
    return F.when(p != "", p)


def doc_id_of(url: Column) -> Column:
    """Trailing "docId" segment (getDocIdStr, UrlUtils.java:197-213)."""
    i = F.regexp_extract(_strip_trailing_slash(url), _TRIPLE, 3)
    return F.when(i != "", i)


def top3_domain(domain: Column) -> Column:
    """Last <=3 labels of a domain — the politeness granularity
    (UrlUtils.getTopThreeLevelDomain, UrlUtils.java:236-258)."""
    t = F.regexp_extract(domain, P.TOP_THREE_LEVEL_DOMAIN_FILTER, 1)
    return F.when(t != "", t).otherwise(domain)


# ---------------------------------------------------------------------------
# P4: temporal-id removal (UrlUtils.removeTemporalIdentifier, :267-300)
# ---------------------------------------------------------------------------

_TEMPORAL = "(?i)" + P.TEMPORAL_IDENTIFIER_FILTER


def remove_temporal_identifier(url: Column) -> Column:
    """Strip `...token=`/`jsessionid=` params, keep trailing params.

    Reference semantics (UrlUtils.java:267-300): on match return
    group1+group2; if group2 starts with "&" and group1 has no "?",
    the first "&" becomes "?" (the stripped param was the first one).
    """
    # the "&"->"?" fix applies to GROUP2's leading "&" only (the
    # reference replaces the first "&" INSIDE afterTemporalIdStr,
    # gated on group1 carrying no "?") — a regex over the rejoined
    # string rewrote the LAST "&" before any "?" and even fired on
    # "&" characters belonging to the path
    g1 = F.regexp_extract(url, _TEMPORAL, 1)
    g2 = F.regexp_extract(url, _TEMPORAL, 2)
    fixed = F.when(
        g2.startswith("&") & ~g1.contains("?"),
        F.concat(g1, F.lit("?"), F.substring(g2, 2, 1 << 30)),
    ).otherwise(F.concat(g1, g2))
    return F.when(url.rlike(_TEMPORAL), fixed).otherwise(url)


# ---------------------------------------------------------------------------
# P5: anchor removal (UrlUtils.removeAnchor, :308-328)
# ---------------------------------------------------------------------------


def remove_anchor(url: Column) -> Column:
    """Drop `#fragment` unless it is a `#/` directory (ANCHOR_FILTER)."""
    return F.regexp_replace(url, "^" + P.ANCHOR_FILTER + "$", "$1")


# ---------------------------------------------------------------------------
# P6/P7: amp; fix + u-ryukyu handle rewrite
# (LoaderAndChecker.handleUrlChecks, :635-644)
# ---------------------------------------------------------------------------


def fix_amp(url: Column) -> Column:
    """Undo double-encoded ampersands: `amp;` -> `&` (all occurrences)."""
    return F.regexp_replace(url, "amp;", "&")


def uryukyu_rewrite(url: Column) -> Column:
    """ir.lib.u-ryukyu.ac.jp handle-prefix swap (/123456789/ ->
    /20.500.12000/), LoaderAndChecker.java:635-641."""
    cond = url.contains("ir.lib.u-ryukyu.ac.jp") & url.contains("/handle/123456789/")
    return F.when(cond, F.regexp_replace(url, "/123456789/", "/20.500.12000/")).otherwise(url)


def clean_url(url: Column) -> Column:
    """The load-time cleanup chain of handleUrlChecks()
    (LoaderAndChecker.java:619-646): temporal-id strip -> u-ryukyu
    rewrite -> amp; fix. (The filter battery runs separately.)"""
    return fix_amp(uryukyu_rewrite(remove_temporal_identifier(url)))


# ---------------------------------------------------------------------------
# P1: RFC-3986 canonicalization — vectorized Arrow UDF.
# The reference delegates to crawler-commons BasicURLNormalizer
# (LoaderAndChecker.java:48); this is an independent implementation of
# the same public normalization rules.
# ---------------------------------------------------------------------------

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


def _normalize_percent(s: str, keep: str = "") -> str:
    """Normalize percent-encoding: decode unreserved chars, uppercase hex
    digits of remaining escapes, encode stray '%' and illegal chars."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            hexpart = s[i + 1 : i + 3]
            if len(hexpart) == 2 and all(h in "0123456789abcdefABCDEF" for h in hexpart):
                val = int(hexpart, 16)
                ch = chr(val)
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + hexpart.upper())
                i += 3
                continue
            out.append("%25")  # stray '%'
            i += 1
            continue
        if c in _UNRESERVED or c in keep:
            out.append(c)
            i += 1
            continue
        # leave other printable ASCII as-is (sub-delims etc.); encode
        # whitespace and non-ASCII
        if c == " ":
            out.append("%20")
        elif ord(c) < 0x20 or ord(c) > 0x7E:
            out.append("".join(f"%{b:02X}" for b in c.encode("utf-8")))
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
        else:
            output.append(seg)
    # preserve leading slash
    res = "/".join(output)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    if path.endswith(("/.", "/..")) and not res.endswith("/"):
        res += "/"
    return res


def canonicalize_one(url: str | None) -> str | None:
    """Canonicalize one URL (RFC-3986-style, BasicURLNormalizer rules):
    lowercase scheme+host, strip default port, strip empty query/fragment
    delimiters, normalize percent-encoding, remove dot segments.
    Returns None for non-normalizable input (reference nulls these out).
    """
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    # fragment dropped outright (BasicURLNormalizer semantics; the
    # separate anchor policy runs earlier in the clean chain)
    u = u.partition("#")[0]
    m = u.split("://", 1)
    if len(m) != 2:
        return None
    scheme, rest = m[0].lower(), m[1]
    if scheme not in ("http", "https", "ftp"):
        return None
    # authority / path+query split
    slash = rest.find("/")
    qmark = rest.find("?")
    if slash == -1 and qmark == -1:
        authority, pathq = rest, ""
    elif qmark != -1 and (slash == -1 or qmark < slash):
        authority, pathq = rest[:qmark], "/" + rest[qmark:]
    else:
        authority, pathq = rest[:slash], rest[slash:]
    if not authority:
        return None
    # userinfo (rare) — keep verbatim
    userinfo = ""
    if "@" in authority:
        userinfo, _, authority = authority.rpartition("@")
        userinfo += "@"
    host, port = authority, ""
    if ":" in authority:
        h, _, p = authority.rpartition(":")
        if p.isdigit():
            host, port = h, p
    host = host.lower().rstrip(".")
    if not host:
        return None
    if port and int(port) == _DEFAULT_PORTS.get(scheme):
        port = ""
    # path + query
    path, query = pathq, ""
    if "?" in pathq:
        path, _, query = pathq.partition("?")
    path = _normalize_percent(path, keep="/:@!$&'()*+,;=")
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    if query:
        query = "?" + _normalize_percent(query, keep="/:@!$&'()*+,;=?")
    elif pathq.endswith("?"):
        query = ""  # drop empty '?'
    netloc = userinfo + host + (f":{port}" if port else "")
    return f"{scheme}://{netloc}{path}{query}"


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Vectorized Arrow UDF: RFC-3986 canonicalization (P1)."""
    return urls.map(canonicalize_one)


def canon_url(url: Column) -> Column:
    """clean_url (native) -> canonicalize (Arrow UDF)."""
    return canonicalize_udf(clean_url(url))


def url_hash64(canon: Column) -> Column:
    """64-bit hash of the canonical URL — the frontier/seen key. Native
    xxhash64 (JVM, codegen'd): stable across sessions and partitions."""
    return F.xxhash64(canon)


def host_bucket(host: Column, num_buckets: int) -> Column:
    """Deterministic host bucket: all URLs of one top-3-level domain land
    in one bucket -> one task owns a host (politeness without locks,
    replacing the reference's per-domain mutex,
    util/http/DomainConnectionData.java:13)."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------------------
# P9: special-URL offline rewrites (crawler/SpecialUrlsHandler.java:38-446)
# Kept as a data-driven (match, pattern, replacement) rule chain -> one
# nested regexp_replace expression, fully JVM-side.
# ---------------------------------------------------------------------------

def _europepmc(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndGetEuropepmcDocUrl (SpecialUrlsHandler.java:86-101):
    # lowercase-match europepmc.org/a(rticle|bstract)s?/pmc.* ->
    # basePath + PMC-prefixed docId + &blobtype=pdf.
    cond = F.lower(url).rlike(r"^https?://europepmc\.org/a(?:rticle|bstract)s?/pmc.*$")
    accid = F.when(doc_id.startswith("PMC"), doc_id).otherwise(F.concat(F.lit("PMC"), doc_id))
    out = F.concat(
        F.lit("https://europepmc.org/backend/ptpmcrender.fcgi?accid="),
        accid,
        F.lit("&blobtype=pdf"),
    )
    return cond & doc_id.isNotNull(), out


def _manuscript_elsevier(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndDowngradeManuscriptElsevierUrl (:106-114): first "https"->"http".
    return (
        url.contains("manuscript.elsevier.com"),
        F.regexp_replace(url, "^https", "http"),
    )


def _nasa(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndGetNasaDocUrl (:118-131): citations page -> api download
    # url, mirrored STEP FOR STEP (replaceFirst of the https base,
    # ensure trailing slash, rebuild) — the old single-regex form
    # diverged from the reference on http:// inputs, where the
    # replaceFirst is a no-op and the reference rebuilds around the
    # UNSTRIPPED url (both shapes are broken fetch targets, but
    # parity means producing the reference's bytes, not ours)
    cond = url.contains("ntrs.nasa.gov/citations") & ~url.contains("api/")
    path = F.regexp_replace(url, r"^https://ntrs\.nasa\.gov/", "")
    path = F.when(path.endswith("/"), path).otherwise(
        F.concat(path, F.lit("/"))
    )
    out = F.concat(
        F.lit("https://ntrs.nasa.gov/api/"), path, F.lit("downloads/"),
        doc_id, F.lit(".pdf"),
    )
    return cond & doc_id.isNotNull(), out


def _frontiersin(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndGetFrontiersinDocUrl (:136-160): /full -> /pdf, else append /pdf.
    in_dom = url.contains("www.frontiersin.org") & url.contains("/article") & ~url.endswith("/pdf")
    out = F.when(url.endswith("/full"), F.regexp_replace(url, "/full$", "/pdf")).otherwise(
        F.concat(url, F.lit("/pdf"))
    )
    return in_dom & doc_id.isNotNull(), out


def _psyarxiv(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandlePsyarxivDocUrl (:165-176): append "/download".
    cond = url.contains("psyarxiv.com") & ~url.contains("/download")
    out = F.when(url.endswith("/"), F.concat(url, F.lit("download"))).otherwise(
        F.concat(url, F.lit("/download"))
    )
    return cond, out


def _ijcseonline(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleIjcseonlineDocUrl (:292-327): pdf_paper_view.php?...&<file>.pdf
    # -> https://www.ijcseonline.org/pub_paper/<file>.pdf
    pat = r"^.+/[^/]+&(.+)$"
    cond = (
        url.contains("www.ijcseonline.org")
        & url.contains("pdf_paper_view.php")
        & url.rlike(pat)
    )
    return cond, F.regexp_replace(url, pat, "https://www.ijcseonline.org/pub_paper/$1")


def _ieeexplore(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleIeeeExplorerDocUrl (:332-345): -> stampPDF?arnumber=<docId>.
    cond = url.contains("ieeexplore.ieee.org") & ~url.contains("/stampPDF/")
    out = F.concat(
        F.lit("https://ieeexplore.ieee.org/stampPDF/getPDF.jsp?tp=&arnumber="),
        doc_id,
    )
    return cond & doc_id.isNotNull(), out


def _osf(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleOSFdocUrl (:350-362): append "/download".
    cond = url.contains("://osf.io") & ~url.contains("/download")
    out = F.when(url.endswith("/"), F.concat(url, F.lit("download"))).otherwise(
        F.concat(url, F.lit("/download"))
    )
    return cond, out


def _wiley(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleWileyDocUrl (:367-412): multi-step rewrite to
    # /doi/pdfdirect/ + download=true.
    cond = url.rlike(r"^(?:http[s]?)://[^/]*onlinelibrary\.wiley\.com/(?:[^/]+/)?doi/.*$")
    u = wiley_base  # subJournal/abstract/fullpdf already stripped (temp col)
    # first matching transformation wins (epdf/ | pdf/ | full/ | abs/ |
    # full-xml/ | plain /doi/) — ordered regexp_replace chain where each
    # later step only applies if the marker is still present.
    u = F.when(u.contains("/pdfdirect/"), u).otherwise(
        F.when(u.contains("epdf/"), F.regexp_replace(u, "epdf/", "pdfdirect/"))
        .when(u.contains("pdf/"), F.regexp_replace(u, "pdf/", "pdfdirect/"))
        .when(u.contains("full/"), F.regexp_replace(u, "full/", "pdfdirect/"))
        .when(u.contains("abs/"), F.regexp_replace(u, "/doi/abs/", "/doi/pdfdirect/"))
        .when(u.contains("full-xml/"), F.regexp_replace(u, "/full-xml/", "/full/"))
        .otherwise(F.regexp_replace(u, "/doi/", "/doi/pdfdirect/"))
    )
    out = F.when(u.contains("download=true"), u).otherwise(
        F.when(u.contains("?"), F.concat(u, F.lit("&download=true"))).otherwise(
            F.concat(u, F.lit("?download=true"))
        )
    )
    return cond, out


def _scielo(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleScieloUrl (:420-426): "amp;" -> "&" (all).
    return url.contains("scielo.br"), F.regexp_replace(url, "amp;", "&")


def _doi_inner(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleDoiUrlsWithInnerLinks (:431-446): unwrap inner url,
    # fixing the browser-collapsed single slash ("https:/x" -> "https://x").
    pat = r"^http[s]?://(?:dx\.)?doi\.org/(http.*)$"
    inner = F.regexp_extract(url, pat, 1)
    fixed = F.regexp_replace(inner, "^(http[s]?):/(?!/)", "$1://")
    return url.rlike(pat), fixed


def _dergipark(url: Column, doc_id: Column, wiley_base: Column) -> tuple[Column, Column]:
    # checkAndHandleDergipark (:279-288): domain swap (all occurrences).
    return (
        url.contains("dergipark.gov.tr"),
        F.regexp_replace(url, r"dergipark\.gov\.tr", "dergipark.org.tr"),
    )


#: first-match-wins order of checkAndHandleSpecialUrls()
#: (crawler/SpecialUrlsHandler.java:38-84).
SPECIAL_URL_HANDLERS = [
    _europepmc,
    _manuscript_elsevier,
    _nasa,
    _frontiersin,
    _psyarxiv,
    _ijcseonline,
    _ieeexplore,
    _osf,
    _wiley,
    _scielo,
    _doi_inner,
    _dergipark,
]


def _special_chain(url: Column, doc_id: Column, wiley_base: Column) -> Column:
    chain = None
    for handler in SPECIAL_URL_HANDLERS:
        cond, out = handler(url, doc_id, wiley_base)
        chain = F.when(cond, out) if chain is None else chain.when(cond, out)
    return chain.otherwise(url)


def _wiley_base(url: Column) -> Column:
    """Shared wiley preprocessing (subJournal / /abstract / /fullpdf
    strip, checkAndHandleWileyDocUrl steps 1-3)."""
    u = F.regexp_replace(
        url, r"^(http[s]?://[^/]*onlinelibrary\.wiley\.com/)[^/]+/(doi/)", "$1$2"
    )
    u = F.regexp_replace(u, "/abstract$", "")
    return F.regexp_replace(u, "/fullpdf$", "")


def with_special_rewrite(
    df: "DataFrame", url_col: str, out_col: str = "special_url"
) -> "DataFrame":
    """P9 as a DataFrame operator: apply the first matching
    special-domain rewrite (if/else-if ladder of
    checkAndHandleSpecialUrls, SpecialUrlsHandler.java:38-84).

    PLAN-SIZE NOTE: the shared subexpressions (URL_TRIPLE docId extract,
    the wiley preprocessing chain) are materialized as temp columns in a
    separate projection. Inlining them per branch explodes the codegen'd
    method past Janino's 64KB limit (observed: InternalCompilerException
    + interpreted-mode fallback). Multi-use non-cheap aliases also stop
    CollapseProject from re-inlining them.
    """
    url = F.col(url_col)
    staged = df.withColumn("_p9_doc_id", doc_id_of(url)).withColumn(
        "_p9_wiley", _wiley_base(url)
    )
    out = _special_chain(url, F.col("_p9_doc_id"), F.col("_p9_wiley"))
    return staged.withColumn(out_col, out).drop("_p9_doc_id", "_p9_wiley")


def rewrite_special(url: Column) -> Column:
    """Column-level P9 (tests / small plans). Prefer
    :func:`with_special_rewrite` in pipelines — this inlines the shared
    subexpressions into every branch."""
    return _special_chain(url, doc_id_of(url), _wiley_base(url))


def was_special_rewritten(url: Column, special_url: Column) -> Column:
    """True when the P9 rewrite changed the url (feeds wasDirectLink, N13)."""
    return special_url != url
