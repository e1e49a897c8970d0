"""Golden tests for G3-G8 HTML link extraction + G5 metadata regexes.

HTML shapes derived from the reference's extraction rules
(crawler/PageCrawler.java:394-651) and its test fixture style
(src/test/.../TestLinkExtraction.java).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from publicationsretriever_spark.functions.htmlparse import (
    extract_links_one,
    extract_links_udf,
    meta_access_restricted,
    meta_doc_url,
)

PAGE = "https://host.org/article/1"


def _links(html):
    return extract_links_one(html, PAGE)


def test_plain_links_gathered_with_structure():
    html = """<html><body><div class="content">
      <a href="/files/a.pdf">paper A</a>
      <a href="https://host.org/article/2">next article</a>
    </div></body></html>"""
    out = _links(html)
    # 'paper A' text is not a DOCUMENT_TEXT match ('paper' alone isn't in
    # the regex) -> both links gathered as plain
    assert [o["signal"] for o in out] == ["plain", "plain"]
    assert out[0]["link"] == "https://host.org/files/a.pdf"
    assert out[0]["structure"].startswith("a\ndiv_content\n")


def test_document_text_short_circuits():
    html = '<html><body><a href="/get/123">Download</a><a href="/x">other</a></body></html>'
    out = _links(html)
    assert len(out) == 1 and out[0]["signal"] == "docFound"
    assert out[0]["link"] == "https://host.org/get/123"


def test_non_valid_document_text_skips_element():
    html = '<html><body><a href="/files/manual.pdf">user manual</a><a href="/y">y</a></body></html>'
    out = _links(html)
    assert [o["signal"] for o in out] == ["plain"]
    assert out[0]["link"].endswith("/y")


def test_footer_and_nav_class_links_rejected():
    html = """<html><body>
      <footer><a href="/contact-page">contact</a></footer>
      <div class="breadcrumb"><a href="/crumb">crumb</a></div>
      <div><a href="/keep">keep me</a></div>
    </body></html>"""
    out = _links(html)
    assert [o["link"] for o in out] == ["https://host.org/keep"]


def test_dynamic_link_blocks_domain():
    html = '<html><body><a href="/page/{{id}}">templated</a></body></html>'
    out = _links(html)
    assert len(out) == 1 and out[0]["signal"] == "dynamic"


def test_javascript_pdflink_extracted():
    html = """<html><body><a href="javascript:pdflink('https://host.org/d.pdf' ,x)">x</a></body></html>"""
    out = _links(html)
    assert out[0]["signal"] == "docFound"
    assert out[0]["link"] == "https://host.org/d.pdf"


def test_link_type_pdf_element():
    html = '<html><head><link href="/real.pdf" type="application/pdf"></head></html>'
    out = _links(html)
    assert out[0]["signal"] == "docFound" and out[0]["link"].endswith("/real.pdf")


def test_form_action_doc_url():
    html = '<html><body><form action="/article/download/55"><input/></form></body></html>'
    out = _links(html)
    assert out[0]["signal"] == "docFound"
    assert out[0]["link"] == "https://host.org/article/download/55"


def test_anchor_removed_from_doc_like_link():
    html = '<html><body><a href="/files/b.pdf#page=2">b</a></body></html>'
    out = _links(html)
    assert out[0]["link"] == "https://host.org/files/b.pdf"


def test_mailto_and_hash_links_dropped():
    html = """<html><body><a href="mailto:x@y.org">mail</a>
      <a href="#">top</a><a href="/">root</a></body></html>"""
    assert _links(html) == []


def test_udf_matches_pure_function(spark):
    html = '<html><body><div><a href="/files/a.pdf">alpha beta</a></div></body></html>'
    df = spark.createDataFrame([(html, PAGE)], ["html", "page_url"])
    out = df.select(
        extract_links_udf(F.col("html"), F.col("page_url")).alias("links")
    ).collect()[0]["links"]
    pure = extract_links_one(html, PAGE)
    assert [(r["link"], r["signal"]) for r in out] == [
        (r["link"], r["signal"]) for r in pure
    ]


def test_meta_doc_url_and_access(spark):
    rows = [
        ('<html><head><meta name="citation_pdf_url" content="https://h.org/p.pdf"/></head></html>',),
        ('<html><head><meta content="https://h.org/q.pdf" name="citation_pdf_url"/></head></html>',),
        ('<html><head><meta name="DC.Rights" content="restrictedAccess"/></head></html>',),
        ("<html><head></head></html>",),
    ]
    df = spark.createDataFrame(rows, ["html"])
    got = df.select(
        meta_doc_url(F.col("html")).alias("doc"),
        meta_access_restricted(F.col("html")).alias("restricted"),
    ).collect()
    assert got[0]["doc"] == "https://h.org/p.pdf"
    assert got[1]["doc"] == "https://h.org/q.pdf"
    assert got[2]["restricted"] is True
    assert got[3]["doc"] is None and got[3]["restricted"] is False


def test_turkj_special_extracts_pdf_from_div():
    """G7 (SpecialUrlsHandler.extractAndCheckTurkjgastroenterolDocUrl,
    :197-254): the pdf path sits in a bare div in the raw html."""
    from publicationsretriever_spark.functions.htmlparse import extract_links_one

    html = (
        "<html><body><div >  /content/files/sayilar/389/buyuk/1-7.pdf"
        " </div></body></html>"
    )
    out = extract_links_one(
        html, "https://www.turkjgastroenterol.org/en/article-x"
    )
    assert out == [{
        "link": "https://www.turkjgastroenterol.org/content/files/sayilar/389/buyuk/1-7.pdf",
        "structure": None,
        "signal": "docFound",
    }]
    # no div match -> page yields nothing (content-problem row upstream)
    assert extract_links_one(
        "<html><body><a href='/x'>x</a></body></html>",
        "https://www.turkjgastroenterol.org/en/article-x",
    ) == []


def test_aup_online_data_title_download_form():
    """G8 (SpecialUrlsHandler.handleAupOnlineDocUrl, :258-273): the doc
    url is the action of the form whose data-title contains 'ownload'."""
    from publicationsretriever_spark.functions.htmlparse import extract_links_one

    html = (
        '<html><body>'
        '<form action="/fake/download" data-title="Preview"><input/></form>'
        '<form action="/deliver/fulltext/1.pdf" data-title="Download PDF">'
        "<input/></form>"
        '<a href="/some/other">other</a>'
        "</body></html>"
    )
    out = extract_links_one(html, "https://www.aup-online.com/content/journals/x")
    assert len(out) == 1
    assert out[0]["signal"] == "docFound"
    assert out[0]["link"] == "https://www.aup-online.com/deliver/fulltext/1.pdf"
    assert out[0]["structure"]  # learned structure (J7) present
    # no Download form -> page yields nothing (DocLinkUnavailable)
    assert extract_links_one(
        '<html><body><a href="/y">y</a></body></html>',
        "https://www.aup-online.com/content/journals/x",
    ) == []


def test_html_to_text_golden(spark):
    from publicationsretriever_spark.functions.htmlparse import (
        html_to_text,
    )

    cases = [
        # script/style bodies dropped, not leaked
        ("<style>p{a}</style><script>var x = '<p>hi</p>';</script>ok",
         "ok"),
        # tags stripped, whitespace normalized
        ("<div>\n  <h1>Title</h1>\n  <p>two\n words</p>\n</div>",
         "Title two words"),
        # comments (multi-line) dropped
        ("a<!-- one\ntwo -->b", "a b"),
        # entity unescape; &amp; LAST so &amp;lt; stays literal &lt;
        ("1 &lt; 2 &amp;&nbsp;&quot;q&quot; &#39;s&#39; &amp;lt;",
         "1 < 2 & \"q\" 's' &lt;"),
        # case-insensitive block tags
        ("<SCRIPT a=b>x</ScRiPt>kept", "kept"),
        ("plain text untouched", "plain text untouched"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
