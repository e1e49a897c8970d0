"""Sitemap (sitemaps.org XML) parsing for seed expansion.

A production crawl discovers most of a site's fetchable URLs from
``/sitemap.xml``, not link extraction — the reference has no sitemap
support (its input lists are externally curated,
PublicationsRetriever.java main loop), but a frontier engine that owns
robots.txt (the north rule) naturally owns the sitemap next to it.

Pure JVM-side column expressions in the Java/RE2-shared regex subset
(like functions/htmlparse.html_to_text): ``regexp_extract_all`` over
the raw XML — no XML library, no Python. That is deliberate: real
sitemaps are large (50k URLs / 50 MB per file) but STRUCTURALLY flat,
and the lenient-regex reading (grab every <url>...</url> block, pull
the child tags) matches how crawlers actually consume them — a
malformed entry degrades to NULL fields instead of failing the file.

Two levels per the spec: a *urlset* (leaf pages: loc + optional
lastmod/changefreq/priority) and a *sitemapindex* (pointers to more
sitemaps — fed back to the fetch stage, not the frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one <url> or <sitemap> entry block; fields read leniently within it
_URL_BLOCK = r"(?s)<url\s*>(.*?)</url\s*>"
_SITEMAP_BLOCK = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC = r"(?s)<loc\s*>\s*([^<]*?)\s*</loc\s*>"
_LASTMOD = r"(?s)<lastmod\s*>\s*([^<]*?)\s*</lastmod\s*>"
_PRIORITY = r"(?s)<priority\s*>\s*([^<]*?)\s*</priority\s*>"


def _field(block: Column, pat: str) -> Column:
    v = F.regexp_extract(block, pat, 1)
    return F.when(v == "", F.lit(None)).otherwise(v)


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities; sitemaps.org REQUIRES loc
    URLs to be entity-escaped, so a spec-compliant multi-parameter
    URL arrives as ...?a=1&amp;b=2 and must be unescaped before it
    can be fetched. &amp; LAST so double-escapes ('&amp;lt;')
    resolve one level per pass, same order as html_to_text."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def sitemap_entries(xml: Column) -> Column:
    """Array of structs (kind, loc, lastmod, priority) from one
    sitemap XML document: kind='url' for urlset leaves, 'sitemap' for
    sitemapindex children. Entries without a <loc> are dropped."""
    def parse(block_pat: str, kind: str) -> Column:
        blocks = F.regexp_extract_all(xml, F.lit(block_pat), 1)
        entries = F.transform(
            blocks,
            lambda b: F.struct(
                F.lit(kind).alias("kind"),
                _xml_unescape(_field(b, _LOC)).alias("loc"),
                _field(b, _LASTMOD).alias("lastmod"),
                _field(b, _PRIORITY)
                .try_cast("double")
                .alias("priority"),
            ),
        )
        return F.filter(entries, lambda e: e["loc"].isNotNull())

    return F.concat(parse(_URL_BLOCK, "url"), parse(_SITEMAP_BLOCK, "sitemap"))


def expand_sitemaps(
    df: DataFrame, xml_col: str = "body", url_col: str = "url"
) -> DataFrame:
    """Fetched sitemap bodies -> one row per discovered entry:
    (source_sitemap, kind, loc, lastmod, priority). 'url' rows feed
    the frontier (priority/lastmod drive ordering and recrawl_schedule
    freshness); 'sitemap' rows go back to the fetch stage.

    Scale shape: a pure projection + explode inside the scan stage —
    no shuffle, no Python; 10^6 sitemap files fan out to ~5*10^10
    candidate rows as generated output, never materialized on the
    driver."""
    return df.select(
        F.col(url_col).alias("source_sitemap"),
        F.explode(sitemap_entries(F.col(xml_col))).alias("e"),
    ).select(
        "source_sitemap",
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.priority").alias("priority"),
    )
