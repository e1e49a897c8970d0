"""The reject-filter regex battery (SURVEY.md §2.3, F1-F16) as native
Catalyst expressions.

The reference evaluates these per-row with java.util.regex in a fixed
cheapest-reject-first order (`UrlTypeChecker.shouldNotAcceptPageUrl()`,
util/url/UrlTypeChecker.java:172-290) with per-rule counters. Here the
whole battery is ONE vectorized when-chain producing a ``reject_reason``
column: Catalyst short-circuits per row exactly like the reference's
sequential returns, the per-rule counters fall out as
``groupBy("reject_reason").count()``, and everything stays inside
WholeStageCodegen (no Python).

Runtime-built patterns (URL_DIRECTORY_FILTER, SPECIFIC_DOMAIN_FILTER,
INTERNAL_LINKS_FILE_FORMAT_FILTER) mirror
``UrlTypeChecker.setRuntimeInitializedRegexes()``
(util/url/UrlTypeChecker.java:68-158) with the same two build flags.
Reference defaults: retrieve_datasets=True, just_html=False
(util/args/ArgsUtils.java:35,55).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import _reference_patterns as P

# Reference matches with Matcher.matches() (full-string). rlike is
# find()-style, so every battery pattern is wrapped ^(?:...)$.


def _matches(col: Column, pattern: str) -> Column:
    return col.rlike("^(?:" + pattern + ")$")


# ---------------------------------------------------------------------------
# F1/F2 fast-path doc/dataset detectors (util/url/LoaderAndChecker.java:36-44)
# ---------------------------------------------------------------------------


def is_possible_doc_url(lower_url: Column) -> Column:
    """F1 DOC_URL_FILTER — "looks like a doc/download url"."""
    return _matches(lower_url, P.DOC_URL_FILTER)


def is_possible_dataset_url(lower_url: Column) -> Column:
    """F2 DATASET_URL_FILTER — dataset-ish extension/format."""
    return _matches(lower_url, P.DATASET_URL_FILTER)


# ---------------------------------------------------------------------------
# Runtime-built battery patterns (UrlTypeChecker.setRuntimeInitializedRegexes)
# ---------------------------------------------------------------------------

_NLA = P.docOrDatasetNegativeLookAroundPattern
_HTPHP = P.htOrPhpExtensionsPattern


def build_url_directory_filter(retrieve_datasets: bool = True, just_html: bool = False) -> str:
    """F3 URL_DIRECTORY_FILTER (util/url/UrlTypeChecker.java:69-93).
    Capture groups: (1) sharedSiteSession, (2) /view/ larger-depth,
    (3) PANGAEA."""
    s = (
        "^https?://.*/(?:(?:(?:(?:discover|profile|user|survey|index|media|theme|product|deposit|default|shop)/" + _NLA
        + "|(?:(?:ldap|password)-)?login|ac[c]?ess(?![./]+)|sign[-]?(?:in|out|up)|session|(?:how-to-)?(?:join[^t]|subscr)|authwall|regist(?:er|ration)|submi(?:t|ssion)|(?:post|send|export|(?:wp-)?admin|home|form|career[s]?|company)/|watch|browse|import|bookmark|announcement|feedback|share[^d]|about|(?:[^/]+-)?faq|wiki|news|events|cart|support|(?:site|html)map|documentation|help|license|disclaimer|copyright|(?:site-)?polic(?:y|ies)(?!.*paper)|privacy|terms|law|principles"
        + "|(?:my|your|create)?[-]?account|my(?:dspace|selection|cart)|(?:service|help)[-]?desk|settings|fund|aut[h]?or" + _NLA
        + "|journal/key|(?:journal-)?editor|author:|(?<!ntrs.nasa.gov/(?:api/)?)citation|review|external|facets|statistics|application|selfarchive|permission|ethic(s)?/.*/view/|conta[c]?t|wallet|contribute|donate|our[_-][\\w]+|template|logo|image|photo/|video|advertiser|most-popular|people|(?:the)?press|for-authors|customer-service[s]?|captcha|clipboard|dropdown|widget"
        + "|(?:forum|blog|column|row|js|[cr]ss|legal)/"
        + "|(?:(?:advanced[-]?)?search|search/advanced|search-results|(?:[e]?books|journals)(?:-catalog)?|issue|docs|oai|(?:abstracting-)?indexing|online[-]?early|honors|awards|meetings|calendar|diversity|scholarships|invo(?:ice|lved)|errata|classroom|publish(?:-with-us)?|upload|products|forgot|home|ethics|comics|podcast|trends|bestof|booksellers|recommendations|bibliographic|volume[s]?)[/]?$"
        + "|rights[-]?permissions|publication[-]?ethics|advertising|reset[-]?password|\\*/|communit(?:y|ies)"
        + "|restricted|noaccess|crawlprevention|error|(?:mis|ab)use|\\?denied|gateway|(?:defaultweb|waiting-)page|sorryserver|(?<!response_type=)cookie|(?:page[-]?)?not[-]?found"
        + "|(?:(?:error)?404(?:_response)?|accessibility|invalid|catalog(?:ue|ar|o)?)\\." + _HTPHP
        + "|(.*sharedsitesession)"
    )
    if not just_html:
        s += "|(.*/view/" + _NLA + ")"
        s += "|(doi.org/https://doi.org/.*pangaea." + ("|pangaea.)" if not retrieve_datasets else ")")
    if not retrieve_datasets:
        s += ").*)|(?:bibtext|dc(?:terms)?|[^/]*(?:tei|endnote))$)"
    else:
        s += ")).*$)"
    return s


def build_specific_domain_filter(just_html: bool = False) -> str:
    """F4 SPECIFIC_DOMAIN_FILTER (util/url/UrlTypeChecker.java:95-154).
    Capture groups: (1) JS-only, (2) doaj result pages, (3) html-fulltext,
    (4) metadata-only, (5) login-required, (6) larger-depth, (7) conn-problem."""
    s = (
        "^https?://[^/]*(?<=[/.])(?:(?<!drive.)google\\.|goo.gl|gstatic|facebook|fb.me|twitter|(?:meta|xing|baidu|t|x|vk).co|insta(?:gram|paper)|tiktok|youtube|vimeo|linkedin|ebay|bing|(?:amazon|[./]analytics)\\.|s.w.org|wikipedia|myspace|yahoo|mail|pinterest|reddit|tumblr"
        + "|www.ccdc.cam.ac.uk|figshare.com/collections/|datadryad.org/stash/dataset/"
        + "|evernote|skype|microsoft|adobe|buffer|digg|stumbleupon|addthis|delicious|dailymotion|gostats|blog(?:ger)?|copyright|friendfeed|newsvine|telegram|getpocket"
        + "|flipboard|line.me|ok.rudouban|qzone|renren|weibo|doubleclick|bit.ly|github|reviewofbooks|plu.mx"
        + "|(?<!files.)wordpress|orcid.org"
        + "|auth(?:oriz(?:e|ation)|entication)?\\."
    )
    if not just_html:
        s += (
            "|(?<!manuscript.)elsevier.com|sciencedirect.com"
            + "|(?:static|multimedia|tienda).elsevier."
            + "|arvojournals.org"
            + "|books.openedition.org"
        )
    s += (
        "|perfdrive."
        + "|services.bepress.com"
        + "|(?:careers|shop).|myworkdayjobs.com"
        + "|editorialmanager.com"
        + "|(tandfonline.com|persee.fr|papers.ssrn.com|documentation.ird.fr|library.unisa.edu.au|publications.cnr.it)"
        + "|(doaj.org/toc/)"
    )
    if not just_html:
        s += (
            "|(dlib.org|saberes.fcecon.unr.edu.ar|eumed.net)"
            + "|(rivisteweb.it|wur.nl|remeri.org.mx|cam.ac.uk|scindeks.ceon.rs|egms.de)"
            + "|(bibliotecadigital.uel.br|cepr.org)"
            + "|(scielosp.org" + _NLA + "|cepr.org|dk.um.si|apospublications.com|jorr.org|rwth-aachen.de|pubmed.ncbi.nlm.nih.gov)"
        )
    s += "|(200.17.137.108)" + ")[^/]*/.*$"
    return s


def build_internal_links_file_format_filter(retrieve_datasets: bool = True) -> str:
    """F10 INTERNAL_LINKS_FILE_FORMAT_FILTER (UrlTypeChecker.java:156-157)."""
    return (
        ".+format=(?:"
        + ("" if retrieve_datasets else "xml|")
        + _HTPHP
        + "|rss|ris|bib|citation_|events_kml).*"
    )


# ---------------------------------------------------------------------------
# Battery evaluation -> reject_reason column
# ---------------------------------------------------------------------------

#: reject_reason values, mirroring the reference's counters/log lines
#: (UrlTypeChecker.java:182-283 and shouldNotAcceptInternalLink :293-308).
REASON_DIRECTORY = "directory_with_problems"
REASON_SHARED_SITE_SESSION = "shared_site_session"
REASON_LARGER_DEPTH_VIEW = "docurl_in_larger_depth_view"
REASON_PANGAEA = "pangaea_invalid_form"
REASON_DOMAIN = "domain_with_problems"
REASON_JAVASCRIPT_DOMAIN = "javascript_powered_domain"
REASON_DOAJ_RESULT = "doaj_result_page"
REASON_HTML_DOCURL = "html_fulltext_domain"
REASON_NO_DOCURLS = "domain_not_providing_docurls"
REASON_LOGIN = "login_required_domain"
REASON_LARGER_DEPTH_DOMAIN = "docurl_in_larger_depth_domain"
REASON_CONN_PROBLEM = "connectivity_problem_domain"
REASON_NON_VALID_DOC = "non_valid_document"
REASON_PLAIN_DOMAIN = "plain_domain"
REASON_FILE_EXTENSION = "irrelevant_extension"
REASON_UNSUPPORTED_DOC_EXT = "unsupported_doc_extension"
REASON_INTERNAL_KEYWORDS = "internal_link_keywords"
REASON_INTERNAL_FORMAT = "internal_link_file_format"
REASON_PLAIN_PAGE_EXT = "plain_page_extension"
REASON_INTERNAL_PREFIX = "internal_link_bad_prefix"


@dataclass(frozen=True)
class FilterBattery:
    """Compiled battery for one configuration (the reference compiles its
    runtime regexes once at startup — setRuntimeInitializedRegexes)."""

    retrieve_datasets: bool = True
    just_html: bool = False
    download_doc_files: bool = False

    @property
    def url_directory_filter(self) -> str:
        return build_url_directory_filter(self.retrieve_datasets, self.just_html)

    @property
    def specific_domain_filter(self) -> str:
        return build_specific_domain_filter(self.just_html)

    @property
    def internal_links_file_format_filter(self) -> str:
        return build_internal_links_file_format_filter(self.retrieve_datasets)

    def page_url_reject_reason(self, lower_url: Column) -> Column:
        """F14 composite pageUrl gate (shouldNotAcceptPageUrl,
        UrlTypeChecker.java:172-290): first matching rule wins; NULL when
        accepted. Group-specific reasons are resolved by capture-group
        extraction, mirroring matcher.group(n) dispatch."""
        dir_pat = self.url_directory_filter
        dom_pat = self.specific_domain_filter

        # NOTE group numbering mirrors the reference EXACTLY, including its
        # off-by-one: `ethic(s)?/` (UrlTypeChecker.java:77) is capture
        # group 1 of URL_DIRECTORY_FILTER, so the reference's group(1)
        # "sharedSiteSession" branch actually fires for ethics-paths, its
        # group(2) "larger depth" branch fires for sharedsitesession urls,
        # and its group(3) "PANGAEA" branch fires for /view/ urls
        # (dispatch at UrlTypeChecker.java:186-196). We reproduce that
        # observable behavior verbatim — accept/reject sets are unaffected,
        # but the reason labels and the sharedSiteSession domain-block side
        # effect follow the reference's real dispatch.
        dir_reason = (
            F.when(F.regexp_extract(lower_url, dir_pat, 1) != "", REASON_SHARED_SITE_SESSION)
        )
        if not self.just_html:
            dir_reason = dir_reason.when(
                F.regexp_extract(lower_url, dir_pat, 2) != "", REASON_LARGER_DEPTH_VIEW
            ).when(F.regexp_extract(lower_url, dir_pat, 3) != "", REASON_PANGAEA)
        dir_reason = dir_reason.otherwise(REASON_DIRECTORY)

        dom_reason = (
            F.when(F.regexp_extract(lower_url, dom_pat, 1) != "", REASON_JAVASCRIPT_DOMAIN)
            .when(F.regexp_extract(lower_url, dom_pat, 2) != "", REASON_DOAJ_RESULT)
        )
        if not self.just_html:
            dom_reason = (
                dom_reason.when(F.regexp_extract(lower_url, dom_pat, 3) != "", REASON_HTML_DOCURL)
                .when(F.regexp_extract(lower_url, dom_pat, 4) != "", REASON_NO_DOCURLS)
                .when(F.regexp_extract(lower_url, dom_pat, 5) != "", REASON_LOGIN)
                .when(F.regexp_extract(lower_url, dom_pat, 6) != "", REASON_LARGER_DEPTH_DOMAIN)
                .when(F.regexp_extract(lower_url, dom_pat, 7) != "", REASON_CONN_PROBLEM)
            )
        else:
            # just_html pattern drops alternatives 3-6, so
            # '(200.17.137.108)' becomes capture group 3 — and the
            # reference's dispatch (UrlTypeChecker.java:215-217)
            # checks group(3) WITHOUT the shouldJustDownloadHtmlFiles
            # guard, so it labels the conn-problem domain with the
            # html-fulltext reason/counter. A numbering quirk, but
            # verbatim dispatch parity is this module's contract
            # (same adjudication as the documented ethic(s)? case).
            dom_reason = dom_reason.when(
                F.regexp_extract(lower_url, dom_pat, 3) != "",
                REASON_HTML_DOCURL,
            )
        dom_reason = dom_reason.otherwise(REASON_DOMAIN)

        # coalesce(when(...)) instead of one long when-chain: each rule's
        # regex is evaluated at most once per row and coalesce
        # short-circuits left-to-right, mirroring the reference's
        # sequential returns (UrlTypeChecker.java:182-283).
        rules = [
            F.when(_matches(lower_url, dir_pat), dir_reason),
            F.when(_matches(lower_url, dom_pat), dom_reason),
            F.when(_matches(lower_url, P.NON_VALID_DOCUMENT), REASON_NON_VALID_DOC),
            F.when(_matches(lower_url, P.PLAIN_DOMAIN_FILTER), REASON_PLAIN_DOMAIN),
            F.when(_matches(lower_url, P.URL_FILE_EXTENSION_FILTER), REASON_FILE_EXTENSION),
        ]
        if self.download_doc_files:
            rules.append(
                F.when(
                    _matches(lower_url, P.CURRENTLY_UNSUPPORTED_DOC_EXTENSION_FILTER),
                    REASON_UNSUPPORTED_DOC_EXT,
                )
            )
        rules.append(F.lit(None).cast("string"))
        return F.coalesce(*rules)

    def internal_link_reject_reason(self, lower_link: Column) -> Column:
        """F15 composite internal-link gate (shouldNotAcceptInternalLink,
        UrlTypeChecker.java:293-308): page gate ∪ F9 ∪ F10 ∪ F11, plus the
        link-prefix filter F12 applied by the crawler before gathering
        (PageCrawler.java:615)."""
        return F.coalesce(
            F.when(
                _matches(lower_link, P.INTERNAL_LINKS_STARTING_FROM_FILTER),
                REASON_INTERNAL_PREFIX,
            ),
            self.page_url_reject_reason(lower_link),
            F.when(
                _matches(lower_link, P.INTERNAL_LINKS_KEYWORDS_FILTER),
                REASON_INTERNAL_KEYWORDS,
            ),
            F.when(
                _matches(lower_link, self.internal_links_file_format_filter),
                REASON_INTERNAL_FORMAT,
            ),
            F.when(_matches(lower_link, P.PLAIN_PAGE_EXTENSION_FILTER), REASON_PLAIN_PAGE_EXT),
            F.lit(None).cast("string"),
        )


DEFAULT_BATTERY = FilterBattery()
