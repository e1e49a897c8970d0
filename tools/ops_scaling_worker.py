"""One batch-ops scaling run, submitted to a standalone cluster.

Launched by tools/bench_ops_scaling.py via

    spark-submit --master spark://127.0.0.1:7077 \
        --conf spark.cores.max=<E> --conf spark.executor.cores=1 \
        --py-files build/publicationsretriever_spark.zip \
        tools/ops_scaling_worker.py <n_executors> <n_docs>

Measures the heavy TRAINING-PIPELINE operators (the crawl side has
its own scaling evidence in BENCH/scaling.json) on a synthesized
corpus generated JVM-side from spark.range — identical input and
identical task set at every cluster size; only concurrency differs.

Ops timed (one action each, wall seconds):
  minhash   minhash_lsh_pairs       (shingle explode + 8 md5 mins + band join)
  ngram     ngram_jaccard_pairs     (int64 shingles, PPJoin prefix filter)
  spans     dup_span_stats          (hash keys, window doc-count)
  gates     text_quality_gates      (pure projection battery)
  shards    token_shard_assign      (two-pass distributed prefix sum)

Prints one `RESULT {json}` line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
    "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi",
    "omega", "red", "green", "blue", "fast", "slow", "table", "row",
    "scan", "join", "hash", "sort", "merge", "spill", "batch", "agg",
    "the", "and", "of", "to", "a", "data", "spark", "query", "plan",
    "cost", "key",
]
PARTS = 32  # fixed task set at every level (same rule as the crawl worker)


def get_session(parallelism: int) -> SparkSession:
    spark = (
        SparkSession.builder.appName(f"ops_scaling_{parallelism}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            "65536",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def synth_docs(spark: SparkSession, n: int):
    """Deterministic word-salad corpus, generated JVM-side: 60-259
    tokens per doc picked by a hash LCG; a FIXED-SIZE family of ~320
    docs are near-copies of a template (so the dedup ops have real
    positives to find). The family is one big near-dup clique whose
    band groups land in single tasks — a real skew tail, kept
    CONSTANT across corpus sizes so the scaling measurement sees the
    linear work grow while the (documented) doc-frequency ceiling
    stays a fixed component."""
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    clique_mod = max(50, n // 320)
    base = spark.range(0, n, 1, PARTS).select(F.col("id").alias("doc_id"))
    n_toks = (F.lit(60) + F.pmod(F.xxhash64(F.col("doc_id")), F.lit(200))).cast("int")
    body = F.transform(
        F.sequence(F.lit(1), n_toks),
        lambda i: F.element_at(
            words_arr,
            (
                F.pmod(
                    F.xxhash64(F.col("doc_id") * F.lit(1315423911) + i.cast("long")),
                    F.lit(len(WORDS)),
                )
                + 1
            ).cast("int"),
        ),
    )
    template = F.concat_ws(
        " ", *[F.lit(WORDS[(i * 7) % len(WORDS)]) for i in range(120)]
    )
    text = F.when(
        F.pmod(F.col("doc_id"), F.lit(clique_mod)) == 0,
        F.concat(
            template,
            F.lit(" variant "),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.concat_ws(" ", body))
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    n_exec = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    spark = get_session(n_exec)

    from publicationsretriever_spark.operators.dedup import (
        dup_span_stats,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from publicationsretriever_spark.operators.packing import (
        token_shard_assign,
    )
    from publicationsretriever_spark.operators.textstats import (
        text_quality_gates,
        token_count,
    )

    docs = synth_docs(spark, n_docs)
    # warm codegen/JIT once on a tiny slice so both levels measure
    # steady-state execution, not first-compile
    tiny = docs.filter(F.col("doc_id") < 200)
    minhash_lsh_pairs(tiny, "text", "doc_id", num_hashes=8, bands=4).count()
    ngram_jaccard_pairs(tiny, "text", "doc_id", threshold=0.8).count()
    dup_span_stats(tiny, "text", "doc_id").count()
    text_quality_gates(tiny, "text", "doc_id").count()

    walls: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        walls[name] = round(time.time() - t0, 3)

    run(
        "minhash",
        lambda: minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=8, bands=4
        ).count(),
    )
    run(
        "ngram",
        lambda: ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.8
        ).count(),
    )
    run(
        "spans",
        lambda: dup_span_stats(docs, "text", "doc_id").filter(
            F.col("dup_spans") > 0
        ).count(),
    )
    run(
        "gates",
        lambda: text_quality_gates(docs, "text", "doc_id").filter(
            F.col("keep")
        ).count(),
    )
    run(
        "shards",
        lambda: token_shard_assign(
            docs.select("doc_id", token_count(F.col("text")).alias("t")),
            "t",
            "doc_id",
            capacity=100_000,
        )
        .agg(F.max("shard"))
        .collect()[0][0],
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
