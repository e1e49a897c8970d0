"""Sitemap parsing: golden XML cases + lenient degradation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.functions.sitemap import expand_sitemaps

pytestmark = pytest.mark.usefixtures("spark")

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.org/a </loc><lastmod>2024-01-02</lastmod>
       <priority>0.8</priority></url>
  <url><loc>https://ex.org/b</loc></url>
  <url><lastmod>2024-03-01</lastmod></url>
  <url><loc>https://ex.org/c</loc><priority>notanumber</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.org/sitemap-1.xml</loc>
           <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://ex.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_parsing_golden(spark):
    df = spark.createDataFrame(
        [("https://ex.org/sitemap.xml", URLSET)], ["url", "body"]
    )
    out = sorted(
        (r["kind"], r["loc"], r["lastmod"], r["priority"])
        for r in expand_sitemaps(df).collect()
    )
    assert out == [
        ("url", "https://ex.org/a", "2024-01-02", 0.8),
        ("url", "https://ex.org/b", None, None),
        # loc-less entry dropped; unparsable priority -> NULL
        ("url", "https://ex.org/c", None, None),
    ]


def test_sitemapindex_parsing(spark):
    df = spark.createDataFrame(
        [("https://ex.org/sitemap.xml", INDEX)], ["url", "body"]
    )
    out = sorted(
        (r["kind"], r["loc"], r["lastmod"])
        for r in expand_sitemaps(df).collect()
    )
    assert out == [
        ("sitemap", "https://ex.org/sitemap-1.xml", "2024-02-01"),
        ("sitemap", "https://ex.org/sitemap-2.xml", None),
    ]


def test_garbage_body_yields_no_rows_not_errors(spark):
    df = spark.createDataFrame(
        [("u1", "<html>not a sitemap</html>"), ("u2", "")],
        ["url", "body"],
    )
    assert expand_sitemaps(df).count() == 0


def test_expand_is_pure_projection(spark):
    df = spark.createDataFrame([("u", URLSET)], ["url", "body"])
    plan = (
        expand_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_loc_entities_unescaped(spark):
    """sitemaps.org REQUIRES entity-escaped loc URLs — '&amp;' in a
    multi-parameter query string must come back as '&' or every such
    URL is fetched at a wrong address; double-escapes resolve one
    level."""
    from publicationsretriever_spark.functions.sitemap import (
        expand_sitemaps,
    )

    xml = ("<urlset><url><loc>https://e.org/p?a=1&amp;b=2</loc></url>"
           "<url><loc>https://e.org/q?x=&quot;y&quot;&amp;z=%3C"
           "</loc></url>"
           "<url><loc>https://e.org/amp?lit=&amp;amp;</loc></url>"
           "</urlset>")
    df = spark.createDataFrame([("https://e.org/s.xml", xml)],
                               "url string, body string")
    locs = {r["loc"] for r in expand_sitemaps(df).collect()}
    assert "https://e.org/p?a=1&b=2" in locs
    assert 'https://e.org/q?x="y"&z=%3C' in locs
    # one unescape level only: '&amp;amp;' -> '&amp;'
    assert "https://e.org/amp?lit=&amp;" in locs
