"""A5/A6/A7: the final statistics report and adaptive phase control.

The reference keeps ~30 atomic counters and prints percentages at the
end (PublicationsRetriever.showStatistics(),
PublicationsRetriever.java:136-256), plus sorted per-domain connection
counts (:239-248). Here every line is ONE aggregation over the results
table — no mutable counters anywhere.

A7 (PageCrawler.checkRemainingInternalLinks, crawler/PageCrawler.java:710-728):
the reference globally disables the low-yield "remaining links" phase
when its hit-rate drops below 0.2% after >=20 evaluations — racy
thread-global. Here it is a deterministic round-boundary decision from
the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PageCrawler.java:60-61
MIN_EVALUATIONS = 20
HIT_RATE_THRESHOLD = 0.002


def crawl_report(results: DataFrame) -> DataFrame:
    """One row per report line (metric, value) — the showStatistics()
    equivalent."""
    total = results.count()
    docs = results.filter(
        ~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")
    ).count()
    dups = results.filter(F.col("docOrDatasetUrl") == "duplicate").count()
    unreachable = results.filter(F.col("docOrDatasetUrl") == "unreachable").count()
    retryable = results.filter(F.col("couldRetry") == "true").count()
    spark = results.sparkSession
    rows = [
        ("total_records", float(total)),
        ("doc_or_dataset_urls_found", float(docs)),
        ("doc_url_rate_pct", 100.0 * docs / total if total else 0.0),
        ("duplicates", float(dups)),
        ("unreachable", float(unreachable)),
        ("could_retry", float(retryable)),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


def reject_reason_report(results: DataFrame) -> DataFrame:
    """Per-reason counts (the reference's per-rule counters,
    PublicationsRetriever.java:192-213) straight from the error column."""
    return (
        results.filter(F.col("error").isNotNull())
        .groupBy("error")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "error")
    )


def domains_by_hits(results: DataFrame) -> DataFrame:
    """A6: per-domain result counts sorted desc
    (PublicationsRetriever.java:239-248)."""
    from ..functions import urls as U

    return (
        results.withColumn("domain", U.top3_domain(U.domain_of(F.col("sourceUrl"))))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("times"))
        .orderBy(F.desc("times"), "domain")
    )


def should_check_remaining_links(results: DataFrame) -> bool:
    """A7: keep the remaining-links phase enabled? Evaluated at round
    boundaries: hits = doc results found via non-doc-like internal
    links; evaluations = all internal-link fetches."""
    internal = results.filter(F.col("pageUrl") != F.col("sourceUrl"))
    evaluations = internal.count()
    if evaluations < MIN_EVALUATIONS:
        return True
    hits = internal.filter(
        ~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")
    ).count()
    return (hits / evaluations) >= HIT_RATE_THRESHOLD
