"""Golden tests for the URL algebra (SURVEY.md §2.2, P1-P9).

Expected values derive from the reference rules:
- triple split: util/url/UrlUtils.java:29,137-233
- temporal-id:  util/url/UrlUtils.java:34,267-300
- anchor:       util/url/UrlUtils.java:36,308-328
- top3domain:   util/url/UrlUtils.java:236-258
- special:      crawler/SpecialUrlsHandler.java:38-446
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.functions import urls as U
from publicationsretriever_spark.functions.urls import canonicalize_one


def _run_column(spark, cases, col_fn):
    df = spark.createDataFrame([(c,) for c, _ in cases], ["url"])
    got = [r[0] for r in df.select(col_fn(F.col("url"))).collect()]
    for (inp, want), out in zip(cases, got):
        assert out == want, f"{inp!r}: got {out!r}, want {want!r}"


DOMAIN_CASES = [
    ("https://www.example.com/path/doc.pdf", "example.com"),
    ("http://EXAMPLE.org/x", "example.org"),
    ("https://ww3.sub.host.co.uk/a/b", "sub.host.co.uk"),
    ("https://host.gr:8080/a", "host.gr"),
    ("not-a-url", None),
    ("https://plain.org/", "plain.org"),
]

TOP3_CASES = [
    ("a.b.c.d.example.co.uk", "example.co.uk"),
    ("example.com", "example.com"),
    ("sub.example.com", "sub.example.com"),
    ("deep.sub.example.com", "sub.example.com"),
]

TEMPORAL_CASES = [
    # token/jsessionid stripped, trailing params kept
    ("https://h.gr/a?jsessionid=ABC&p=2", "https://h.gr/a?p=2"),
    ("https://h.gr/a?token=XYZ", "https://h.gr/a"),
    ("https://h.gr/a?p=1&access_token=XYZ&q=2", "https://h.gr/a?p=1&q=2"),
    ("https://h.gr/a;jsessionid=9A8B?x=1", "https://h.gr/a?x=1"),
    ("https://h.gr/a?x=1", "https://h.gr/a?x=1"),  # no-op
]

ANCHOR_CASES = [
    ("https://h.gr/a#section2", "https://h.gr/a"),
    ("https://academic.microsoft.com/#/detail/2945595536",
     "https://academic.microsoft.com/#/detail/2945595536"),  # '#/' kept
    ("https://h.gr/a", "https://h.gr/a"),
]

SPECIAL_CASES = [
    # europepmc (SpecialUrlsHandler.java:86-101)
    ("https://europepmc.org/articles/PMC6235689",
     "https://europepmc.org/backend/ptpmcrender.fcgi?accid=PMC6235689&blobtype=pdf"),
    ("https://europepmc.org/abstract/PMC/5834632",
     "https://europepmc.org/backend/ptpmcrender.fcgi?accid=PMC5834632&blobtype=pdf"),
    # nasa (:118-131)
    ("https://ntrs.nasa.gov/citations/19930083001",
     "https://ntrs.nasa.gov/api/citations/19930083001/downloads/19930083001.pdf"),
    # already-api url untouched
    ("https://ntrs.nasa.gov/api/citations/19930083001/downloads/19930083001.pdf",
     "https://ntrs.nasa.gov/api/citations/19930083001/downloads/19930083001.pdf"),
    # frontiersin (:136-160)
    ("https://www.frontiersin.org/articles/10.3389/fphys.2018.00414/full",
     "https://www.frontiersin.org/articles/10.3389/fphys.2018.00414/pdf"),
    ("https://www.frontiersin.org/article/10.3389/feart.2017.00079",
     "https://www.frontiersin.org/article/10.3389/feart.2017.00079/pdf"),
    # psyarxiv (:165-176)
    ("https://psyarxiv.com/e9uk7", "https://psyarxiv.com/e9uk7/download"),
    ("https://psyarxiv.com/e9uk7/", "https://psyarxiv.com/e9uk7/download"),
    # ieeexplore (:332-345)
    ("https://ieeexplore.ieee.org/document/8924293",
     "https://ieeexplore.ieee.org/stampPDF/getPDF.jsp?tp=&arnumber=8924293"),
    # osf (:350-362)
    ("https://osf.io/2xpq7", "https://osf.io/2xpq7/download"),
    # wiley (:367-412)
    ("https://onlinelibrary.wiley.com/doi/10.1111/polp.12377",
     "https://onlinelibrary.wiley.com/doi/pdfdirect/10.1111/polp.12377?download=true"),
    ("https://onlinelibrary.wiley.com/doi/abs/10.1002/xyz.123",
     "https://onlinelibrary.wiley.com/doi/pdfdirect/10.1002/xyz.123?download=true"),
    ("https://onlinelibrary.wiley.com/doi/epdf/10.1111/polp.12377",
     "https://onlinelibrary.wiley.com/doi/pdfdirect/10.1111/polp.12377?download=true"),
    # scielo (:420-426)
    ("https://www.scielo.br/j/bjb/a/64jB/?amp;format=pdf&lang=en",
     "https://www.scielo.br/j/bjb/a/64jB/?&format=pdf&lang=en"),
    # doi-with-inner-url (:431-446)
    ("https://dx.doi.org/https:/doi.org/10.1039/C6OB01382A",
     "https://doi.org/10.1039/C6OB01382A"),
    # dergipark (:279-288)
    ("http://dergipark.gov.tr/beuscitech/issue/40162/477737",
     "http://dergipark.org.tr/beuscitech/issue/40162/477737"),
    # manuscript.elsevier (:106-114)
    ("https://manuscript.elsevier.com/S0167739X17311676/pdf",
     "http://manuscript.elsevier.com/S0167739X17311676/pdf"),
    # untouched url
    ("https://repository.example.org/handle/123/456",
     "https://repository.example.org/handle/123/456"),
]


def test_domain_of(spark):
    _run_column(spark, DOMAIN_CASES, U.domain_of)


def test_top3_domain(spark):
    df = spark.createDataFrame([(c,) for c, _ in TOP3_CASES], ["d"])
    got = [r[0] for r in df.select(U.top3_domain(F.col("d"))).collect()]
    for (inp, want), out in zip(TOP3_CASES, got):
        assert out == want, f"{inp!r}: got {out!r}, want {want!r}"


def test_remove_temporal_identifier(spark):
    _run_column(spark, TEMPORAL_CASES, U.remove_temporal_identifier)


def test_remove_anchor(spark):
    _run_column(spark, ANCHOR_CASES, U.remove_anchor)


def test_rewrite_special(spark):
    # production path: DataFrame operator with shared temp columns
    df = spark.createDataFrame([(c,) for c, _ in SPECIAL_CASES], ["url"])
    out = U.with_special_rewrite(df, "url")
    got = {r["url"]: r["special_url"] for r in out.collect()}
    for inp, want in SPECIAL_CASES:
        assert got[inp] == want, f"{inp!r}: got {got[inp]!r}, want {want!r}"


def test_uryukyu_rewrite(spark):
    _run_column(
        spark,
        [("http://ir.lib.u-ryukyu.ac.jp/handle/123456789/8743",
          "http://ir.lib.u-ryukyu.ac.jp/handle/20.500.12000/8743"),
         ("http://other.org/handle/123456789/8743",
          "http://other.org/handle/123456789/8743")],
        U.uryukyu_rewrite,
    )


# --- P1 canonicalizer: pure-Python unit tests (no Spark needed) ---

CANON_CASES = [
    ("HTTP://Example.COM:80/a/./b/../c", "http://example.com/a/c"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/%7efoo", "http://example.com/~foo"),
    ("http://example.com/%7Efoo", "http://example.com/~foo"),
    ("http://example.com/a%2Fb", "http://example.com/a%2Fb"),  # keep encoded '/'
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/x#frag", "http://example.com/x"),
    ("ftp://Example.com/f", "ftp://example.com/f"),
    ("garbage", None),
    ("", None),
    (None, None),
    ("http://example.com/%zz", "http://example.com/%25zz"),  # stray %
    ("http://example.com./x", "http://example.com/x"),  # trailing host dot
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonicalize_one(raw, want):
    assert canonicalize_one(raw) == want


def test_canonicalize_udf(spark):
    raws = [c for c, _ in CANON_CASES if c]
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    got = {r["url"]: r["canon"] for r in
           df.select("url", U.canonicalize_udf(F.col("url")).alias("canon")).collect()}
    for raw, want in CANON_CASES:
        if raw:
            assert got[raw] == want


def test_url_hash_is_stable(spark):
    df = spark.createDataFrame([("https://example.com/a",)], ["url"])
    h1 = df.select(U.url_hash64(F.col("url"))).collect()[0][0]
    h2 = df.select(U.url_hash64(F.col("url"))).collect()[0][0]
    assert h1 == h2 and isinstance(h1, int)


def test_temporal_strip_multi_param_and_path_ampersand(spark):
    """UrlUtils.java:294-297 exactly: the '&'->'?' fix replaces
    GROUP2's first '&' (only when group1 has no '?'); it must not
    rewrite the last '&' of a multi-param tail nor touch '&'
    characters that belong to the path."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.functions.urls import (
        remove_temporal_identifier,
    )

    cases = [
        # token first => '?a=1&b=2', NOT '...&a=1?b=2'
        ("http://x.com/doc?token=abc&a=1&b=2", "http://x.com/doc?a=1&b=2"),
        # token later: g1 already has '?', no fix
        ("http://x.com/doc?a=1&jsessionid=ZZZ&b=2",
         "http://x.com/doc?a=1&b=2"),
        # '&' in the PATH with a following param: g1 contains '&' but
        # the fix keys on g2's first char, so the path stays intact
        ("http://x.com/a&b?token=q&c=3", "http://x.com/a&b?c=3"),
        # no temporal id: untouched, path '&' never rewritten
        ("http://x.com/a&b?c=3", "http://x.com/a&b?c=3"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    out = df.withColumn("got", remove_temporal_identifier(F.col("url")))
    for r in out.collect():
        assert r["got"] == r["want"], (r["url"], r["got"], r["want"])
