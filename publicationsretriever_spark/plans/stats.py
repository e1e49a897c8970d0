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
    equivalent. ONE aggregation job (conditional sums), honouring the
    module contract — five separate count() actions would scan the
    cumulative results lineage five times per report."""
    c = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    row = results.agg(
        F.count(F.lit(1)).alias("total"),
        c(~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")).alias(
            "docs"
        ),
        c(F.col("docOrDatasetUrl") == "duplicate").alias("dups"),
        c(F.col("docOrDatasetUrl") == "unreachable").alias("unreach"),
        c(F.col("couldRetry") == "true").alias("retryable"),
    ).collect()[0]
    total = row["total"]
    rows = [
        ("total_records", float(total)),
        ("doc_or_dataset_urls_found", float(row["docs"] or 0)),
        (
            "doc_url_rate_pct",
            100.0 * (row["docs"] or 0) / total if total else 0.0,
        ),
        ("duplicates", float(row["dups"] or 0)),
        ("unreachable", float(row["unreach"] or 0)),
        ("could_retry", float(row["retryable"] or 0)),
    ]
    return results.sparkSession.createDataFrame(
        rows, "metric string, value double"
    )


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
    """A7, REPORT-LEVEL APPROXIMATION over the results contract: the
    results table carries no link-phase column, so this proxies
    "evaluations" as rows whose pageUrl differs from sourceUrl and
    "hits" as the resolved ones among them — a coarser signal than
    the reference's per-page remaining-phase counters. The ENGINE
    does NOT use this helper: its conformance-exact A7 wiring counts
    one evaluation per page entering the remaining phase and hits
    from remaining links only (plans/rounds.py, pytest-pinned by
    test_mla_a7_conformance). Use this only for offline reporting on
    a bare results table. One aggregation job."""
    row = results.filter(F.col("pageUrl") != F.col("sourceUrl")).agg(
        F.count(F.lit(1)).alias("evaluations"),
        F.sum(
            (~F.col("docOrDatasetUrl").isin("duplicate", "unreachable"))
            .cast("long")
        ).alias("hits"),
    ).collect()[0]
    evaluations = row["evaluations"]
    if evaluations < MIN_EVALUATIONS:
        return True
    return ((row["hits"] or 0) / evaluations) >= HIT_RATE_THRESHOLD


class MlaGate:
    """A8: the MLA success-rate gating state machine
    (MachineLearning.shouldRunPrediction(),
    machine_learning/MachineLearning.java:187-240; constants :35-40).

    The reference evaluates this per page under a synchronized lock over
    racy atomic counters. Here the same transitions run at ROUND
    boundaries, fed by per-round aggregates (gathered/checked/found
    deltas come from one groupBy over the round's results) — making the
    learn -> run -> sleep -> restart cycle deterministic and resumable
    (the whole state is five integers, stored in snapshot lineage).

    Reference semantics preserved:
    - learning period until > ``URLS_TO_GATHER_BEFORE_STARTING`` urls
      gathered (:191-199);
    - success-rate checkpoint every ``LEAST_URLS_BEFORE_ACCURACY_TEST``
      MLA-stage pages (:216-220);
    - rate = 100 * found_since_last_break / checked_since_last_break
      (getCurrentSuccessRate, :174-177);
    - rate < ``LEAST_SUCCESS_PCT`` -> sleep for
      ``URLS_TO_WAIT_UNTIL_RESTART`` MLA-stage pages (:230-239), then
      restart (:202-209).
    """

    URLS_TO_GATHER_BEFORE_STARTING = 5000   # MachineLearning.java:38
    LEAST_URLS_BEFORE_ACCURACY_TEST = 1000  # :39
    URLS_TO_WAIT_UNTIL_RESTART = 30000      # :40
    LEAST_SUCCESS_PCT = 51.0                # :35

    def __init__(self) -> None:
        self.gathered = 0          # timesGatheredData
        self.pages_reached = 0     # totalPagesReachedMLAStage
        self.checked = 0           # pageUrlsCheckedWithMLA
        self.found = 0             # docUrlsFoundByMLA
        self.started = False       # mlaStarted
        self.sleeping = False      # isInSleepMode
        self.end_of_sleep = 0      # endOfSleepNumOfUrls
        self.last_break = 0        # latestSuccessBreakPoint
        self.last_checked = 0      # latestUrlsMLAChecked
        self.last_found = 0        # latestMLADocUrlsFound
        self.rates: list[float] = []  # successRateList

    def observe_round(
        self, gathered: int, pages_reached: int, checked: int, found: int
    ) -> None:
        """Fold one round's aggregate deltas into the counters."""
        self.gathered += gathered
        self.pages_reached += pages_reached
        self.checked += checked
        self.found += found

    def current_success_rate(self) -> float:
        denom = self.checked - self.last_checked
        return 100.0 * (self.found - self.last_found) / denom if denom else 0.0

    def should_run_prediction(self) -> bool:
        if not self.started:
            if self.gathered <= self.URLS_TO_GATHER_BEFORE_STARTING:
                self.last_break = self.URLS_TO_GATHER_BEFORE_STARTING
                return False
            self.started = True
        if self.sleeping:
            if self.pages_reached > self.end_of_sleep:
                self.sleeping = False
                return True
            return False
        next_break = (
            self.last_break + self.LEAST_URLS_BEFORE_ACCURACY_TEST + self.end_of_sleep
        )
        if self.pages_reached < next_break:
            return True
        rate = self.current_success_rate()
        self.rates.append(rate)
        if rate >= self.LEAST_SUCCESS_PCT:
            self.end_of_sleep = 0
            self.last_break = self.pages_reached
            return True
        self.end_of_sleep = self.pages_reached + self.URLS_TO_WAIT_UNTIL_RESTART
        self.last_found = self.found
        self.last_checked = self.checked
        self.last_break += 1
        self.sleeping = True
        return False

    def average_success_rate(self) -> float:
        """getAverageSuccessRate (MachineLearning.java:356-369)."""
        if not self.rates:
            return self.current_success_rate()
        return sum(sorted(self.rates)) / len(self.rates)

    def to_lineage(self) -> dict:
        return {k: v for k, v in self.__dict__.items()}

    @classmethod
    def from_lineage(cls, d: dict) -> "MlaGate":
        g = cls()
        g.__dict__.update(d)
        return g
