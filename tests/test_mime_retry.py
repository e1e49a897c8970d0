"""Golden tests for mime classification (N9) and retry ladder (N7).

Expected values derive from ConnSupportUtils.hasDocOrDatasetMimeType()
(util/http/ConnSupportUtils.java:257-366) and
LoaderAndChecker.getWasValidAndCouldRetry() (util/url/LoaderAndChecker.java:724-767).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from publicationsretriever_spark.functions import mime as M
from publicationsretriever_spark.functions import retry as R

# (url, content_type, content_disposition, expected_category)
MIME_CASES = [
    ("https://x.org/f.pdf", "application/pdf", None, "document"),
    ("https://x.org/f", "application/pdf; charset=utf-8", None, "document"),
    ("https://x.org/f", "('application/pdf', none)", None, "document"),
    ("https://x.org/f", "application/pdf'", None, "document"),
    ("https://x.org/f", "text/html", None, None),
    ("https://x.org/data.csv", "text/csv", None, "dataset"),
    ("https://x.org/d", "application/zip", None, "dataset"),
    # possible doc-or-dataset: octet-stream resolved by url/disposition
    ("https://x.org/paper.pdf", "application/octet-stream", None, "document"),
    ("https://x.org/d.csv", "application/octet-stream", None, "dataset"),
    ("https://x.org/d", "application/octet-stream", 'filename="a.pdf"', "document"),
    ("https://x.org/plain", "application/octet-stream", None, None),
    # page mime but pdf disposition (bib.irb.hr case)
    ("https://x.org/f", "text/html", 'inline; filename="f.pdf"', "document"),
    # no mime at all -> disposition only
    ("https://x.org/f", None, 'attachment; filename="f.pdf"', "document"),
    ("https://x.org/f", None, "attachment", None),
    ("https://x.org/f", None, None, None),
    # System.IO.FileInfo oddity
    ("https://x.org/getfile.aspx?f=doc.pdf", "system.io.fileinfo", None, "document"),
    # postscript counts as document when NOT downloading (default)
    ("https://x.org/f.ps", "application/postscript", None, "document"),
    # ReDoS guard: >255-char mime -> plain extraction fails -> url fallback
    ("https://x.org/f.pdf", "charset" + "x" * 300, None, "document"),
]


def test_classify_mime(spark):
    df = spark.createDataFrame(
        [(u, m, d) for u, m, d, _ in MIME_CASES], ["url", "mime", "disp"]
    )
    got = [
        r[0]
        for r in df.select(
            M.classify_mime(F.col("url"), F.col("mime"), F.col("disp"))["mime_category"]
        ).collect()
    ]
    errors = [
        f"{case[:3]}: got {out!r}, want {case[3]!r}"
        for case, out in zip(MIME_CASES, got)
        if out != case[3]
    ]
    assert not errors, "\n".join(errors)


# (error_class, url, wasUrlValid, couldRetry)
RETRY_CASES = [
    ("http_404", "https://x.org/f", "false", "false"),
    ("http_400", "https://x.org/f", "false", "false"),
    ("http_410", "https://x.org/f", "false", "false"),
    ("http_403", "https://x.org/f", "true", "true"),
    ("http_429", "https://x.org/f", "true", "true"),
    ("http_503", "https://x.org/f", "true", "true"),
    ("http_500", "https://x.org/f", "true", "false"),  # blockMost5XX default
    ("http_511", "https://x.org/f", "true", "false"),
    ("conn_timeout", "https://x.org/f", "true", "true"),
    ("unsupported_head", "https://x.org/f", "true", "true"),
    ("domain_blocked", "https://x.org/f", "true", "true"),
    ("weird", "https://x.org/f", "true", "false"),
    # sciencedirect/elsevier urls always retryable while valid
    ("weird", "https://www.sciencedirect.com/science/article/1", "true", "true"),
    ("http_404", "https://www.sciencedirect.com/science/article/1", "false", "false"),
]


def test_retry_ladder(spark):
    df = spark.createDataFrame(
        [(e, u) for e, u, _, _ in RETRY_CASES], ["error_class", "url"]
    )
    res = df.select(
        R.was_valid_and_could_retry(F.col("error_class"), F.col("url")).alias("r")
    ).select("r.wasUrlValid", "r.couldRetry").collect()
    errors = []
    for case, row in zip(RETRY_CASES, res):
        if (row[0], row[1]) != (case[2], case[3]):
            errors.append(f"{case[:2]}: got {(row[0], row[1])}, want {case[2:]} ")
    assert not errors, "\n".join(errors)
