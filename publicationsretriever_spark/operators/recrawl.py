"""Freshness-driven recrawl scheduling: turn per-URL fetch history
into the next fetch time.

The reference is a single-pass retriever — every URL is fetched once
per run and the input list is externally curated
(PublicationsRetriever.java main loop; no revisit policy exists). A
continuously-operating crawl needs the revisit decision in-engine:
URLs that change often are refetched sooner, URLs that never change
back off, and URLs that keep erroring back off exponentially (the
classic uniform/proportional revisit-policy trade, Cho &
Garcia-Molina, "Effective Page Refresh Policies" TODS 2003, plus
standard crawler error backoff).

Semantics are DETERMINISTIC INTEGER arithmetic so any engine (and the
DuckDB oracle) reproduces them bit-for-bit:

- history rows: (url_id, ts, outcome) with outcome in
  'changed' | 'unchanged' | 'error' (content hash moved / same /
  fetch failed);
- staleness ratio: delay = base_delay_s * (1 + n_unchanged)
  // (1 + n_changed)  — integer division; a page that changed every
  visit stays near base, a page that never changed grows linearly
  with evidence;
- error backoff: delay <<= min(fail_streak, 16) where fail_streak =
  number of fetches AFTER the last non-error fetch (all of them, if
  no fetch ever succeeded);
- clamp to [base_delay_s, max_delay_s];
- next_fetch_ts = last fetch ts + delay seconds (exact integer-second
  timestamp add).

Scale shape: one hash shuffle on url_id — the trailing-streak count
needs each URL's max non-error ts visible to its rows, computed with
a window partitioned by url_id, and the following groupBy(url_id)
reuses the same partitioning (no second exchange). Per-URL history is
short (tens of rows), so partitions stay balanced; there is no
corpus-wide window or sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    df: DataFrame,
    id_col: str = "url_id",
    ts_col: str = "ts",
    outcome_col: str = "outcome",
    base_delay_s: int = 3600,
    max_delay_s: int = 30 * 86400,
) -> DataFrame:
    """Returns one row per URL: (id, n_fetches, n_changed,
    n_unchanged, n_error, fail_streak, last_ts, delay_s,
    next_fetch_ts)."""
    is_err = F.col(outcome_col) == "error"
    w = Window.partitionBy(id_col)
    tagged = df.withColumn(
        "_ok_max", F.max(F.when(~is_err, F.col(ts_col))).over(w)
    )
    agg = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.count(F.when(F.col(outcome_col) == "changed", 1)).alias(
            "n_changed"
        ),
        F.count(F.when(F.col(outcome_col) == "unchanged", 1)).alias(
            "n_unchanged"
        ),
        F.count(F.when(is_err, 1)).alias("n_error"),
        F.count(
            F.when(
                F.col("_ok_max").isNull()
                | (F.col(ts_col) > F.col("_ok_max")),
                1,
            )
        ).alias("fail_streak"),
        F.max(ts_col).alias("last_ts"),
    )
    base = F.lit(int(base_delay_s)).cast("long")
    stale = (
        base
        * (F.lit(1) + F.col("n_unchanged"))
        / (F.lit(1) + F.col("n_changed"))
    ).cast(
        "long"
    )  # trunc == floor: everything non-negative
    # shiftleft's bit count must be a column here (F.shiftleft only
    # accepts a literal), hence the expr form
    backoff = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(least(fail_streak, 16) AS INT))"
    )
    delay = F.least(
        F.lit(int(max_delay_s)).cast("long"),
        F.greatest(base, stale * backoff),
    )
    return agg.select(
        F.col(id_col),
        "n_fetches",
        "n_changed",
        "n_unchanged",
        "n_error",
        "fail_streak",
        "last_ts",
        delay.alias("delay_s"),
        F.timestamp_add("SECOND", delay.cast("int"), F.col("last_ts")).alias(
            "next_fetch_ts"
        ),
    )


def apply_revalidation(
    prior: DataFrame,
    fetched: DataFrame,
    id_col: str = "url_id",
) -> DataFrame:
    """Fold a revalidation round's fetch outcomes back into the stored
    per-URL state — the batch half of conditional-GET recrawling
    (sources/livehttp.LiveHttpResolver.resolve_conditional is the wire
    half). Beyond-reference: the reference fetches once per run and
    keeps no validator state.

    ``prior``: one row per stored URL —
    (id, payload_hash, etag, last_modified, fetched_at_ms).
    ``fetched``: this round's conditional-GET results (same columns
    plus status); URLs not due this round simply have no row.

    Per URL (pure CASE logic — the DuckDB oracle runs it verbatim):

    - no fetch row        -> action 'kept': state unchanged, no outcome
    - status 304          -> 'revalidated': payload kept, validators
                             refreshed when the response carried new
                             ones (coalesce), timestamp advanced;
                             outcome 'unchanged'
    - 2xx                 -> 'replaced': new payload + validators;
                             outcome 'changed' iff the payload hash
                             moved, else 'unchanged' (origin without
                             validator support re-sent equal bytes)
    - anything else       -> 'error': stored state kept verbatim;
                             outcome 'error'

    Two clocks, deliberately distinct: ``fetched_at_ms`` is STATE
    (when the stored payload was last obtained/confirmed — it must
    NOT advance on errors), while ``attempt_at_ms`` records this
    round's fetch time for every attempted row, errors included. The
    history feed for :func:`recrawl_schedule` is the non-kept rows'
    (id, attempt_at_ms, outcome) — feeding the STATE clock instead
    would pin an erroring URL's history at its last success, zero
    its fail_streak, and defeat the error backoff entirely (a
    permanently-503 URL would be re-fetched every round). The full
    recrawl loop: schedule -> conditional fetch -> this merge ->
    append history -> schedule.

    Scale shape: ONE equi-join on the id (fetched is round-sized —
    only due URLs — so it broadcasts under AQE when small; at equal
    sizes it is a co-partitioned hash join), then a projection. No
    window, no second shuffle."""
    f = fetched.select(
        F.col(id_col),
        F.col("status").alias("_f_status"),
        F.col("payload_hash").alias("_f_hash"),
        F.col("etag").alias("_f_etag"),
        F.col("last_modified").alias("_f_lm"),
        F.col("fetched_at_ms").alias("_f_at"),
    )
    j = prior.join(f, id_col, "left")
    ok2xx = (F.col("_f_status") >= 200) & (F.col("_f_status") <= 299)
    action = (
        F.when(F.col("_f_status").isNull(), F.lit("kept"))
        .when(F.col("_f_status") == 304, F.lit("revalidated"))
        .when(ok2xx, F.lit("replaced"))
        .otherwise(F.lit("error"))
    )
    outcome = (
        F.when(F.col("_f_status").isNull(), F.lit(None).cast("string"))
        .when(F.col("_f_status") == 304, F.lit("unchanged"))
        .when(
            ok2xx,
            F.when(
                F.col("_f_hash") == F.col("payload_hash"),
                F.lit("unchanged"),
            ).otherwise(F.lit("changed")),
        )
        .otherwise(F.lit("error"))
    )
    keep_new = ok2xx
    reval = F.col("_f_status") == 304
    return j.select(
        F.col(id_col),
        action.alias("action"),
        F.when(keep_new, F.col("_f_hash"))
        .otherwise(F.col("payload_hash"))
        .alias("payload_hash"),
        F.when(keep_new, F.col("_f_etag"))
        .when(reval, F.coalesce(F.col("_f_etag"), F.col("etag")))
        .otherwise(F.col("etag"))
        .alias("etag"),
        F.when(keep_new, F.col("_f_lm"))
        .when(reval, F.coalesce(F.col("_f_lm"), F.col("last_modified")))
        .otherwise(F.col("last_modified"))
        .alias("last_modified"),
        F.when(keep_new | reval, F.col("_f_at"))
        .otherwise(F.col("fetched_at_ms"))
        .alias("fetched_at_ms"),
        F.col("_f_at").alias("attempt_at_ms"),
        outcome.alias("outcome"),
    )
