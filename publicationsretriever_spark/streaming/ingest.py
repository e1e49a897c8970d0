"""Streaming seed ingestion (SURVEY.md §2.1 S1/S2 as a stream).

The reference tails a file in 3000-line batches
(FileUtils.getNextIdUrlPairBatchFromJson, util/file/FileUtils.java:249-289);
at web scale seeds arrive continuously. This module expresses the same
load-stage as a Structured Streaming query:

  readStream(seeds) -> clean/canonicalize/gate -> watermarked
  dropDuplicates(url_hash) -> frontier rows (append) / per-host rates.

``foreachBatch`` is the exactly-once sink hook: each micro-batch is a
frontier delta the round scheduler picks up — the streaming and batch
paths share all column logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import filters as FL
from ..functions import urls as U


def seed_stream_to_frontier(stream: DataFrame, num_buckets: int = 32) -> DataFrame:
    """Transform a streaming seed source (columns: id, url, ts) into
    gated, canonicalized frontier rows. Watermark + dropDuplicates =
    the cross-batch URL-seen guard inside the engine's state store
    (exact seen-set still enforced by the round scheduler's anti-join).
    """
    gated = stream.withColumn(
        "reject_reason",
        FL.DEFAULT_BATTERY.page_url_reject_reason(F.lower(F.col("url"))),
    ).filter(F.col("reject_reason").isNull())
    canon = gated.withColumn("canon_url", U.canonicalize_udf(U.clean_url(F.col("url"))))
    canon = canon.filter(F.col("canon_url").isNotNull())
    out = (
        canon.withColumn("url_hash", U.url_hash64(F.col("canon_url")))
        .withColumn("host", U.top3_domain(U.domain_of(F.col("url"))))
        # batch parity: the _gate's domain_unretrievable reject — a
        # NULL domain would otherwise mint host_bucket =
        # pmod(xxhash64(NULL)=42, n) and serialize every such row in
        # one NULL host group (the rounds.py:583 trap)
        .filter(F.col("host").isNotNull())
        .withColumn("host_bucket", U.host_bucket(F.col("host"), num_buckets))
        .withWatermark("ts", "10 minutes")
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: with the
        # event-time column absent from the subset, plain
        # dropDuplicates never evicts state (the watermark has no
        # effect) and the url_hash store grows forever — the exact
        # pathology payload_dedup_stream documents
        .dropDuplicatesWithinWatermark(["url_hash"])
    )
    return out.select(
        "id", "url", "canon_url", "url_hash", "host", "host_bucket", "ts"
    )


def per_host_rates(frontier_stream: DataFrame) -> DataFrame:
    """Windowed per-host arrival rates — the live signal for politeness
    budgeting and hot-host quota tuning (N5). Expects the already
    watermarked output of :func:`seed_stream_to_frontier` (re-defining
    a watermark downstream is disallowed by Spark)."""
    return frontier_stream.groupBy(F.window("ts", "5 minutes"), "host").agg(
        F.count(F.lit(1)).alias("n_urls")
    )


def schedule_politely(
    frontier_stream: DataFrame, politeness_ms: int = 3000
) -> DataFrame:
    """Custom STATEFUL streaming operator: the per-host politeness token
    bucket (N5, ConnSupportUtils.applyPolitenessDelay :561-598) as
    durable stream state via ``applyInPandasWithState``.

    Each host group keeps one long of state — the next free fetch slot —
    so slot assignment continues seamlessly ACROSS micro-batches (the
    batch engine's task-local clock resets per round; the stream's
    clock never does). Rows are slotted in deterministic (url_hash)
    order within each batch, mirroring the batch fetch stage.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "id string, url string, url_hash long, host string, "
        "planned_fetch_ms long"
    )
    state_schema = "next_slot long"

    def assign(key, pdfs, state):
        import pandas as pd

        (next_slot,) = state.get if state.exists else (0,)
        # buffer ALL Arrow chunks before sorting: a host group larger
        # than arrow.maxRecordsPerBatch arrives as several pdfs, and
        # per-chunk sorts would make the slot order depend on
        # nondeterministic chunk boundaries. The buffer is bounded by
        # the GROUP (one host's rows in one micro-batch), the same
        # bound the state contract already assumes.
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            whole = (
                parts[0] if len(parts) == 1 else pd.concat(parts)
            ).sort_values("url_hash", kind="mergesort")
            slots = [
                next_slot + i * politeness_ms for i in range(len(whole))
            ]
            next_slot = slots[-1] + politeness_ms
            yield pd.DataFrame(
                {
                    "id": whole["id"], "url": whole["url"],
                    "url_hash": whole["url_hash"], "host": whole["host"],
                    "planned_fetch_ms": slots,
                }
            )
        state.update((next_slot,))

    return frontier_stream.groupBy("host").applyInPandasWithState(
        assign, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def payload_dedup_stream(
    stream: DataFrame,
    hash_col: str = "content_hash",
    ts_col: str = "fetch_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-payload dedup gate — the streaming counterpart
    of operators/dedup.exact_dedup (reference semantics:
    checkAndHandleDuplicateHash, util/http/ConnSupportUtils.java:
    414-455, which consults an in-memory hash multimap; a stream at
    10^10 URLs cannot hold that map unbounded).

    ``dropDuplicatesWithinWatermark`` keys the dedup state on
    ``hash_col`` and EVICTS each key once the event-time watermark
    passes it — state is bounded by the duplicate-arrival horizon
    (how far apart in event time two copies of the same payload can
    arrive), not by corpus size. Plain ``dropDuplicates`` on a stream
    keeps every key forever and eventually OOMs the state store; the
    watermarked form is the only shape that survives an unbounded
    crawl. Duplicates farther apart than the watermark pass through —
    the batch compaction's exact_dedup sweep catches those, same
    two-tier contract as the URL-seen sketch (fast approximate gate
    in-line, exact sweep at rest)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [hash_col]
    )
