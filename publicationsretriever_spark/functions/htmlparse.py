"""G3-G8: HTML link extraction as a vectorized Arrow UDF.

The reference uses Jsoup with exception-driven control flow
(PageCrawler.extractInternalLinksFromHtml, crawler/PageCrawler.java:394-474):
``DocLinkFoundException`` short-circuits the page search,
``DocLinkInvalidException`` stops it as failed,
``DynamicInternalLinksFoundException`` blocks the whole domain. Here the
exceptions become DATA — the UDF returns
``array<struct<link, structure, signal>>`` with
``signal ∈ {docFound, docInvalid, dynamic, plain}``; a stop-signal
yields a single-element array (the page search stops), mirroring the
reference's semantics without exceptions.

No HTML library ships in this container, so a minimal DOM is built on
stdlib html.parser — enough for tag/class/id ancestry (structure filter
G4, PageCrawler.java:560-602), element text, and the attribute rules.
The full F15 internal-link gate stays downstream in Catalyst (the
Java-regex battery); the UDF only applies the checks the reference
performs DURING extraction with Python-compatible regexes
(NON_VALID_DOCUMENT / DOCUMENT_TEXT compile under ``re`` — their only
lookbehind is fixed-width).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import _reference_patterns as P
from .mime import KNOWN_DOC_MIME_TYPES_EXTENDED

# Python-re ports (these particular patterns are re-compatible; verified
# at import). Reference matches with .matches() -> fullmatch.
NON_VALID_DOCUMENT_RE = re.compile(P.NON_VALID_DOCUMENT, re.DOTALL)
DOCUMENT_TEXT_RE = re.compile(P.DOCUMENT_TEXT)
DOC_URL_RE = re.compile(P.DOC_URL_FILTER, re.DOTALL)
DATASET_URL_RE = re.compile(P.DATASET_URL_FILTER, re.DOTALL)
INTERNAL_LINKS_STARTING_RE = re.compile(P.INTERNAL_LINKS_STARTING_FROM_FILTER)
JAVASCRIPT_DOC_LINK_RE = re.compile(P.JAVASCRIPT_DOC_LINK, re.IGNORECASE)

# PageCrawler.java:551-557
_COMMON = (
    r"website-navigation|reference|su[m]{1,2}ar(?:io|y)(?!.*metadata.*)|author|logo"
    r"|related" + P.spaceOrDashes + "product"
)
PARENT_CLASS_RE = re.compile(
    r"(?:^(?:tab|product-head-bnrs)$|.*(?:" + _COMMON
    + r"|breadcrumb|su[b]?scri(?:p[tc]i[oó]n|b(?:a|ir)se)|reco[m]{1,2}enda(?:tion|do)"
    + r"|metric|stats|cookie|kapak|accesos-usuario).*)",
    re.DOTALL,
)
PARENT_ID_RE = re.compile(r".*(?:" + _COMMON + r"|other).*", re.DOTALL)

MAX_INTERNAL_LINKS = 500       # PageCrawler.java:57
STRUCTURE_DEPTH = 50           # PageStructureMLA NUM_ELEMENTS_IN_STRUCTURE

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "own_text")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []
        self.parent = parent
        self.own_text = []

    def attr(self, name: str) -> str:
        return (self.attrs.get(name) or "").strip()

    def text(self) -> str:
        parts = list(self.own_text)
        for c in self.children:
            parts.append(c.text())
        return " ".join(p for p in (x.strip() for x in parts) if p)


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", [], None)
        self.cur = self.root
        self.all_nodes: list[_Node] = []

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.all_nodes.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.all_nodes.append(node)

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data.strip():
            self.cur.own_text.append(data)


def _structure(node: _Node) -> str:
    """PageStructureMLA.getPageTagAndClassStructureForElement (:47-62):
    tag[_class] per ancestor, newline-separated, up to 50 levels."""
    parts = []
    el, count = node, 0
    # inclusive bound ON PURPOSE: the reference's do-while appends
    # BEFORE testing elementsCount <= 50 (PageStructureMLA.java:51-59),
    # so it emits up to 51 ancestry lines despite the constant's name —
    # parity means reproducing that off-by-one, not "fixing" it
    while el is not None and el.tag != "#root" and count <= STRUCTURE_DEPTH:
        cls = el.attr("class")
        parts.append(el.tag + ("_" + cls if cls else ""))
        count += 1
        el = el.parent
    return "\n".join(parts) + "\n"


def _has_unacceptable_structure(node: _Node, page_url: str) -> bool:
    """G4 (PageCrawler.hasUnacceptableStructure, :560-602)."""
    if node.attr("class") == "state-published":
        link = node.attr("href")
        if link.startswith("http"):
            m = re.match(r"https?://([^/:?#]+)", link)
            if m and m.group(1).lower() not in page_url:
                return True
    parent = node.parent
    if parent is None or parent.tag == "#root":
        return False
    own = " ".join(parent.own_text).strip().lower()
    if own and NON_VALID_DOCUMENT_RE.fullmatch(own):
        return True
    while parent is not None and parent.tag != "#root":
        if parent.tag in ("footer", "header"):
            return True
        cls = parent.attr("class").lower()
        if cls and PARENT_CLASS_RE.fullmatch(cls):
            return True
        pid = parent.attrs.get("id", "")
        if pid and PARENT_ID_RE.fullmatch(pid.lower()):
            return True
        parent = parent.parent
    return False


def _data_link(node: _Node) -> str | None:
    """getInternalDataLink (:535-548): first attr whose name contains
    'data' (except data-follow-set) with a non-trivial value."""
    for name, val in node.attrs.items():
        if "data" in name and "data-follow-set" not in name:
            v = (val or "").strip()
            if v and v != "#":
                return v
    return None


def full_url(page_url: str, link: str) -> str | None:
    """P8 (ConnSupportUtils.getFullyFormedUrl, :1369-1392): resolve a
    relative link against the page; '?'-links replace the query."""
    try:
        if link.startswith("?"):
            base = page_url.split("?", 1)[0]
            return base + link
        return urljoin(page_url, link)
    except ValueError:
        return None


#: G7: www.turkjgastroenterol.org embeds the pdf path in a bare div
#: (SpecialUrlsHandler.Turkjgastroenterol_docUrl_pattern, :192)
TURKJ_DOC_URL_RE = re.compile(
    r"<div[\s]*>[\s]*(/content/files/[^<>]+.pdf)[\s]*</div>"
)


def extract_links_one(
    html: str | None, page_url: str, retrieve_documents: bool = True,
    retrieve_datasets: bool = False,
) -> list[dict]:
    """One page's extraction (G3). Returns [{link, structure, signal}].

    Per-domain extraction specials run first, mirroring
    PageCrawler.visit's dispatch:
    - G7 turkjgastroenterol (SpecialUrlsHandler.java:197-254): the doc
      url is regex-extracted from the raw html; no match ends the page
      (the reference logs a content-problem row — here the empty link
      list produces the page's "no docUrl found" row).
    - G8 aup-online (SpecialUrlsHandler.java:258-273): the doc url is
      the ``action`` of the form whose ``data-title`` contains
      "ownload"; anything else on the page is ignored either way
      (DocLinkFound/DocLinkUnavailable both stop the generic gather).
    """
    if not html:
        return []
    if "turkjgastroenterol" in page_url:
        m = TURKJ_DOC_URL_RE.search(html)
        if m:
            return [{"link": full_url(page_url, m.group(1)),
                     "structure": None, "signal": "docFound"}]
        return []
    builder = _DomBuilder()
    try:
        builder.feed(html)
    except Exception:  # noqa: BLE001 - malformed html: give up gracefully
        return []
    if "aup-online" in page_url:
        for el in builder.all_nodes:
            if el.tag == "form" and "ownload" in (el.attr("data-title") or ""):
                action = (el.attr("action") or "").strip()
                if action:
                    return [{"link": full_url(page_url, action),
                             "structure": _structure(el), "signal": "docFound"}]
        return []
    # selector `a, link[href][type*=pdf], form[action]` (PageCrawler.java:397)
    elements = [
        n for n in builder.all_nodes
        if n.tag == "a"
        or (n.tag == "link" and n.attr("href") and "pdf" in n.attr("type"))
        or (n.tag == "form" and n.attr("action"))
    ]
    out: list[dict] = []

    def stop(link, node, signal):
        return [{"link": link, "structure": _structure(node), "signal": signal}]

    for el in elements:
        if _has_unacceptable_structure(el, page_url):
            continue

        if retrieve_documents:
            # text / title doc-keyword checks (checkTextOrTitleAlongWithLink,
            # :506-532): NON_VALID -> skip element; DOCUMENT_TEXT -> stop
            # the page search with the element's link (the downstream F15
            # gate decides docFound vs docInvalid).
            verdict, found_link = "none", None
            for attr_text in (el.text().strip(), el.attr("title")):
                if not attr_text:
                    continue
                low = attr_text.lower()
                if NON_VALID_DOCUMENT_RE.fullmatch(low):
                    verdict = "skip"
                elif DOCUMENT_TEXT_RE.fullmatch(low):
                    link = el.attr("href")
                    if not link or link == "#":
                        link = _data_link(el)
                    if not link or link.startswith("javascript:"):
                        verdict = "skip"
                    else:
                        verdict = "docFound"
                        found_link = link.replace("/view/", "/download/", 1)
                if verdict != "none":
                    break
            if verdict == "skip":
                continue
            if verdict == "docFound":
                # raw-link fallback when resolution fails — a NULL
                # doc link would mark the page resolved with no
                # usable url (reference carries the raw link)
                return stop(
                    full_url(page_url, found_link) or found_link,
                    el, "docFound",
                )
            # link[type=doc-mime] fast path (:476-489)
            ltype = el.attr("type")
            if ltype and ltype in KNOWN_DOC_MIME_TYPES_EXTENDED:
                link = el.attr("href")
                if not link or link == "#":
                    return stop(link, el, "docInvalid")
                link = link.replace("/view/", "/download/", 1)
                return stop(
                    full_url(page_url, link) or link, el, "docFound"
                )

        # getInternalLink (:477-503)
        link = el.attr("href")
        if not link or link == "#":
            link = _data_link(el)
            if link is None:
                action = el.attr("action")
                if not action or action == "#":
                    continue
                low_action = action.lower()
                # the reference's form gate is the OR of both mode
                # clauses (PageCrawler.java:485-488): docs-mode
                # demands a doc-url action, datasets-mode a
                # dataset-url action — the old doc-only clause let
                # ANY form action stop the page in dataset mode
                if (
                    retrieve_documents
                    and not DOC_URL_RE.fullmatch(low_action)
                ) or (
                    retrieve_datasets
                    and not DATASET_URL_RE.fullmatch(low_action)
                ):
                    continue
                # unresolvable action: the reference throws
                # DocLinkFound with the RAW link (getFullyFormedUrl
                # null skips the invalid check), never a null link
                return stop(
                    full_url(page_url, action) or action, el, "docFound"
                )

        # checkAndGatherInternalLink (:605-651)
        if link == "/":
            continue
        if "{{" in link or "<?" in link:
            return stop(link, el, "dynamic")
        low = link.lower()
        if INTERNAL_LINKS_STARTING_RE.fullmatch(low):
            continue
        if "#" in low:
            if DOC_URL_RE.fullmatch(low) or DATASET_URL_RE.fullmatch(low):
                link = re.sub(r"#(?!/).+$", "", link)
            elif "/#/" not in low:
                continue
        elif '"' in low or "[error" in low:
            continue
        if low.startswith("javascript:"):
            m = JAVASCRIPT_DOC_LINK_RE.fullmatch(link)
            if not m:
                continue
            return stop(full_url(page_url, m.group(1)), el, "docFound")

        out.append(
            {"link": full_url(page_url, link), "structure": _structure(el),
             "signal": "plain"}
        )
        if len(out) > MAX_INTERNAL_LINKS:
            # reference rejects pages with >500 links (RuntimeException)
            return []
    return out


LINK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("link", T.StringType()),
            T.StructField("structure", T.StringType()),
            T.StructField("signal", T.StringType()),
        ]
    )
)


@F.pandas_udf(LINK_STRUCT)
def extract_links_udf(html: pd.Series, page_url: pd.Series) -> pd.Series:
    """Vectorized G3 extraction: (html, page_url) -> links+signals."""
    return pd.Series(
        [extract_links_one(h, u) for h, u in zip(html, page_url)]
    )


# G5: metadata handler regexes (crawler/MetadataHandler.java:25-56) — the
# meta-docUrl and access-rights scans run NATIVELY on the html column
# (regexp_extract, java.util.regex) — no Python.
_META_NAME = 'name="(?:[^<]*(?:(?:citation|wkhealth)(?:_fulltext)?_)?pdf|eprints.document)_url"'
_META_CONTENT = 'content="(http[^"]+)"'
META_DOC_URL = (
    "(?i)<meta(?:[^<]*" + _META_NAME + "[^<]*" + _META_CONTENT
    + "|[^<]*" + _META_CONTENT + "[^<]*" + _META_NAME + ")[^>]*[/]?>"
)
_ACCESS_NAME = 'name="DC.(?:Access)?Rights"'
_ACCESS_CONTENT = 'content="([^"]+)"'
# (the reference embeds a redundant inline (?i) mid-pattern,
# MetadataHandler.java:28 — dropped here so the pattern also compiles
# under Python re for the oracle)
META_ACCESS_RIGHTS = (
    "(?i)<meta(?:[^<]*" + _ACCESS_NAME + "[^<]*" + _ACCESS_CONTENT
    + "|[^<]*" + _ACCESS_CONTENT + "[^<]*" + _ACCESS_NAME + ")[^>]*[/]?>"
)
NO_ACCESS_RIGHTS = (
    ".*(?:(close[d]?|embargo(?:ed)?|restrict(?:ed)?|metadata" + P.spaceOrDashes
    + "only|paid)(?:" + P.spaceOrDashes + "access)?|(?:no[t]?|není)"
    + P.spaceOrDashes + "(?:accessible|přístupná)|inaccessible|(?:acceso"
    + P.spaceOrDashes + ")?cerrado).*"
)


def meta_doc_url(html_col):
    """Extract the citation_pdf_url-style meta docUrl (G5). Two capture
    groups (name-first / content-first order): coalesce them."""
    g1 = F.regexp_extract(html_col, META_DOC_URL, 1)
    g2 = F.regexp_extract(html_col, META_DOC_URL, 2)
    return F.when(g1 != "", g1).when(g2 != "", g2)


def meta_access_restricted(html_col):
    """True when DC.Rights/DC.AccessRights marks the page restricted."""
    g1 = F.regexp_extract(html_col, META_ACCESS_RIGHTS, 1)
    g2 = F.regexp_extract(html_col, META_ACCESS_RIGHTS, 2)
    rights = F.lower(F.when(g1 != "", g1).when(g2 != "", g2))
    return rights.isNotNull() & rights.rlike("^(?:" + NO_ACCESS_RIGHTS + ")$")


def localhost_fix(url_col, page_domain_col):
    """P10 (MetadataHandler.java:59,172): replace localhost host part
    with the page's domain."""
    return F.regexp_replace(
        url_col,
        P.LOCALHOST_DOMAIN_REPLACEMENT_PATTERN,
        F.concat(F.lit("://"), page_domain_col),
    )


def html_to_text(html_col):
    """HTML -> plain text for corpus building from the crawl's stored
    pages (the pages_html sink, S6): drop script/style/comment blocks,
    strip the remaining tags, unescape the common entities, normalize
    whitespace. A pure regexp_replace chain — whole-stage codegen, no
    shuffle, one read of the html column at 100 TB; every pattern is
    in the Java/RE2 shared subset (inline (?is) flags, non-greedy
    block bodies, no lookaround) so the DuckDB oracle compiles the
    same automata. Order matters: blocks BEFORE the generic tag strip
    (else `<script>var a=1</script>` leaks its body), entities AFTER
    it (else a literal `&lt;p&gt;` in text would become a strippable
    tag — the reference's own escaping concern, JSoup handles it
    natively in PageCrawler)."""
    t = F.regexp_replace(html_col, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last: &amp;lt; must yield &lt;, not <
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
