"""One scaling run for the round-5 CLOSING operators (Z-order layout
+ manifest, cross-modal retrieval recall@k, conditional-GET
revalidation merge), submitted to a standalone cluster — same
protocol as tools/ops6_scaling_worker.py.

Launched by tools/bench_ops7_scaling.py via

    spark-submit --master spark://127.0.0.1:7077 \
        --conf spark.cores.max=<E> --conf spark.executor.cores=1 \
        --py-files build/publicationsretriever_spark.zip \
        tools/ops7_scaling_worker.py <n_executors> <n_docs>

Ops timed (one action each, wall seconds):
  zorder    zorder_layout + zorder_manifest (min/max pass, Morton
            projection, one hash shuffle into z files, stats agg)
  recall    retrieval_recall_at_k (corpus scan x broadcast queries,
            counted ranks — the heavy cosine fan-out)
  revalidate apply_revalidation  (slim equi-join + CASE projection)

All inputs are pure arithmetic projections of spark.range — identical
input and task set at every cluster size; only concurrency differs.
Row multiples per op are floor-clearing (the ops6 reading): slim
plan-machinery ops run over many more rows than the cosine fan-out.
Prints one `RESULT {json}` line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from ops_scaling_worker import get_session  # noqa: E402

DIM = 32
N_QUERIES = 64


def _vec(col: str):
    """Deterministic pseudo-embedding: a pure JVM projection of the id
    (no Python, no rand()) — identical at every cluster size."""
    return F.expr(
        f"transform(sequence(0, {DIM - 1}), i -> "
        f"CAST(pmod({col} * (i + 3) * 2654435761, 1000003) AS DOUBLE) "
        f"/ 1000003.0 - 0.5)"
    )


def main() -> None:
    n_exec = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    spark = get_session(n_exec)

    from publicationsretriever_spark.operators.packing import (
        zorder_layout,
        zorder_manifest,
    )
    from publicationsretriever_spark.operators.recrawl import (
        apply_revalidation,
    )
    from publicationsretriever_spark.operators.similarity import (
        retrieval_recall_at_k,
    )

    # zorder: one min/max agg + Morton projection + one slim-row hash
    # shuffle — 1024x rows to clear the per-job floor (64x left a 4s
    # N-wall = scheduler floor, raw 0.44; 512x still carried ~2.5s of
    # floor in a 14s wall, raw 0.70 — same floor artifact ops6 hit)
    zrows = spark.range(0, n_docs * 1024, 1, 32).select(
        F.col("id").alias("row_id"),
        ((F.col("id") * 2654435761) % 1000003).cast("double").alias("x"),
        ((F.col("id") * 40503) % 999983).cast("double").alias("y"),
    )

    # recall: corpus scan x N_QUERIES broadcast queries, DIM-dim
    # cosines — 512x rows (4x and 64x cuts hit the floor: 1.8s/4.2s
    # N-walls, raw 0.33/0.52 with identical counts)
    corpus = spark.range(0, n_docs * 512, 1, 32).select(
        F.col("id").alias("pair_id"), _vec("id").alias("embedding")
    )
    queries = spark.range(0, N_QUERIES, 1, 4).select(
        (F.col("id") * 7).alias("pair_id"),
        _vec("id * 7 + 1").alias("embedding"),
    )

    # revalidation: slim equi-join + CASE projection — 1024x rows
    # (256x: 12s N-wall raw 0.76; 512x: 24s raw 0.88 — floor receding)
    n_r = n_docs * 1024
    prior = spark.range(0, n_r, 1, 32).select(
        F.col("id").alias("url_id"),
        F.md5(F.col("id").cast("string")).alias("payload_hash"),
        F.concat(F.lit('W/"'), F.md5(F.col("id").cast("string")),
                 F.lit('"')).alias("etag"),
        F.lit(None).cast("string").alias("last_modified"),
        (F.col("id") * 1000).alias("fetched_at_ms"),
    )
    fetched = prior.filter(F.col("url_id") % 10 >= 3).select(
        "url_id",
        F.when(F.col("url_id") % 10 <= 4, 304)
        .when(F.col("url_id") % 10 <= 7, 200)
        .otherwise(503).cast("int").alias("status"),
        F.when(
            F.col("url_id") % 10 == 5, F.col("payload_hash")
        ).when(
            (F.col("url_id") % 10).isin(6, 7),
            F.md5(F.concat(F.col("url_id").cast("string"), F.lit("!"))),
        ).alias("payload_hash"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("last_modified"),
        (F.col("url_id") * 1000 + 500).alias("fetched_at_ms"),
    )

    # warm codegen/JIT on tiny slices
    tiny_z = zrows.filter(F.col("row_id") < 256)
    zorder_manifest(
        zorder_layout(tiny_z, ["x", "y"], bits=10, file_bits=3),
        ["x", "y"],
    ).count()
    retrieval_recall_at_k(
        queries.limit(4), corpus.filter(F.col("pair_id") < 256), [10]
    ).count()
    apply_revalidation(
        prior.filter(F.col("url_id") < 256),
        fetched.filter(F.col("url_id") < 256),
    ).count()

    walls: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        walls[name] = round(time.time() - t0, 3)

    run(
        "zorder",
        lambda: zorder_manifest(
            zorder_layout(zrows, ["x", "y"], bits=15, file_bits=6),
            ["x", "y"],
        ).count(),
    )
    run(
        "recall",
        lambda: retrieval_recall_at_k(
            queries, corpus, [1, 10, 100]
        ).count(),
    )
    run(
        "revalidate",
        lambda: apply_revalidation(prior, fetched)
        .filter(F.col("action").isNotNull())
        .count(),
    )

    print(
        "RESULT "
        + json.dumps(
            {
                "n_executors": n_exec,
                "n_docs": n_docs,
                "walls": walls,
                "total_wall": round(sum(walls.values()), 3),
                "counts": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
