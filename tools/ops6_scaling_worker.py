"""One scaling run for THIS round's later training/crawl operators,
submitted to a standalone cluster (same protocol as
tools/ops_scaling_worker.py / ops5_scaling_worker.py).

Launched by tools/bench_ops6_scaling.py via

    spark-submit --master spark://127.0.0.1:7077 \
        --conf spark.cores.max=<E> --conf spark.executor.cores=1 \
        --py-files build/publicationsretriever_spark.zip \
        tools/ops6_scaling_worker.py <n_executors> <n_docs>

Ops timed (one action each, wall seconds):
  incdedup  minhash_band_index + incremental_neardup_pairs
            (corpus 80% indexed once, batch 20% broadcast-joined)
  aspect    aspect_batch_assign  (bucket argmin projection + two-pass rank)
  wdsplan   wds_shard_plan       (tar-byte prefix sum + shard offsets)
  epoch     epoch_shuffle        (seeded md5 permutation rank)
  recrawl   recrawl_schedule     (per-URL history window + agg)

The corpus is ops_scaling_worker.synth_docs — identical input and
identical task set at every cluster size; only concurrency differs.
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

from ops_scaling_worker import get_session, synth_docs  # noqa: E402


def main() -> None:
    n_exec = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    spark = get_session(n_exec)

    from publicationsretriever_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_band_index,
    )
    from publicationsretriever_spark.operators.multimodal import (
        aspect_batch_assign,
    )
    from publicationsretriever_spark.operators.packing import epoch_shuffle
    from publicationsretriever_spark.operators.recrawl import (
        recrawl_schedule,
    )
    from publicationsretriever_spark.sources.webdataset import wds_shard_plan

    docs = synth_docs(spark, n_docs)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # the plan-machinery ops (projection argmin, prefix sums, window
    # ranks) are far lighter per row than text mining, so they run
    # over 8x the rows — otherwise their walls sit on the per-job
    # scheduler floor and the ratio measures Spark overhead, not the
    # operator. Their inputs are pure arithmetic projections of a
    # range (no text), which is exactly their production shape:
    # metadata columns, not payloads.
    n_rows = n_docs * 8
    rows = spark.range(0, n_rows, 1, 32).select(
        F.col("id").alias("doc_id")
    )
    # pure prefix-sum/window/agg machinery is lighter still than the
    # argmin projection: 64x rows to clear the floor
    n_rows2 = n_docs * 64
    rows2 = spark.range(0, n_rows2, 1, 32).select(
        F.col("id").alias("doc_id")
    )
    imgs = rows.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(16) + (F.col("doc_id") * 37) % 1984).cast("int").alias("w"),
        (F.lit(16) + (F.col("doc_id") * 59) % 1984).cast("int").alias("h"),
    )
    # the shard plan is the cheapest op of all (two slim scans, one
    # bucket shuffle of 3 longs/row): 512x rows to clear the floor
    rows3 = spark.range(0, n_docs * 512, 1, 32).select(
        F.col("id").alias("doc_id")
    )
    sized = rows3.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(512) + F.col("doc_id") % 4096).cast("long").alias(
            "payload_len"
        ),
        (F.lit(1) + F.col("doc_id") % 200).cast("long").alias(
            "caption_len"
        ),
    )
    # fetch history: ~16 fetches per URL, hash-derived outcome mix and
    # minute-spaced timestamps — all JVM-side projections of doc_id.
    # 256x rows: recrawl_schedule is one url_id hash exchange over
    # 4 slim columns — at 64x rows its 4N wall (~1.7s) was ~30%
    # scheduler floor and the ratio measured Spark overhead, not the
    # operator (same floor-vs-slope reading as wdsplan's 512x)
    n_rows_r = n_docs * 256
    rows_r = spark.range(0, n_rows_r, 1, 32).select(
        F.col("id").alias("doc_id")
    )
    n_urls = max(64, n_rows_r // 16)
    hist = rows_r.select(
        (F.col("doc_id") % n_urls).alias("url_id"),
        F.timestamp_add(
            "MINUTE",
            (F.col("doc_id") / n_urls).cast("int"),
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
        ).alias("ts"),
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 2, "changed")
        .when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 4, "error")
        .otherwise("unchanged")
        .alias("outcome"),
    )

    # warm codegen/JIT on a tiny slice
    tiny = docs.filter(F.col("doc_id") < 200)
    tiny_idx = minhash_band_index(tiny, "text", "doc_id", 8, 4)
    incremental_neardup_pairs(tiny, tiny_idx, "text", "doc_id", 8, 4).count()
    aspect_batch_assign(imgs.filter(F.col("image_id") < 200), 64).count()
    wds_shard_plan(sized.filter(F.col("image_id") < 200), 1 << 20).count()
    epoch_shuffle(rows2.filter(F.col("doc_id") < 200), "doc_id").count()
    recrawl_schedule(hist.filter(F.col("url_id") < 50)).count()

    walls: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        walls[name] = round(time.time() - t0, 3)

    index = minhash_band_index(corpus, "text", "doc_id", 8, 4)
    run(
        "incdedup",
        lambda: incremental_neardup_pairs(
            batch, index, "text", "doc_id", 8, 4
        ).count(),
    )
    run(
        "aspect",
        lambda: aspect_batch_assign(imgs, batch_size=64, block_size=4096)
        .filter(F.col("batch_idx") >= 0)
        .count(),
    )
    run(
        "wdsplan",
        lambda: wds_shard_plan(sized, shard_max_bytes=1 << 22)
        .filter(F.col("offset_in_tar") >= 0)
        .count(),
    )
    run(
        "epoch",
        lambda: epoch_shuffle(
            rows2, "doc_id", seed="s1", shard_size=4096
        )
        .filter(F.col("shard") >= 0)
        .count(),
    )
    run("recrawl", lambda: recrawl_schedule(hist).count())

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
