"""One scaling run for the ROUND-5 training-pipeline operators,
submitted to a standalone cluster (same protocol as
tools/ops_scaling_worker.py, which covers the earlier batch ops).

Launched by tools/bench_ops5_scaling.py via

    spark-submit --master spark://127.0.0.1:7077 \
        --conf spark.cores.max=<E> --conf spark.executor.cores=1 \
        --py-files build/publicationsretriever_spark.zip \
        tools/ops5_scaling_worker.py <n_executors> <n_docs>

Ops timed (one action each, wall seconds):
  dropspans  drop_dup_spans     (span explode + winner window + rebuild join)
  decon      decontaminate      (eval-span broadcast join, w=13 stride 1)
  lm         lm_quality_score   (trigram window counts, one text scan)
  mixture    mixture_sample     (stats agg + md5-bucket WHERE)

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
        decontaminate,
        drop_dup_spans,
    )
    from publicationsretriever_spark.operators.textstats import (
        lm_quality_score,
        mixture_sample,
    )

    docs = synth_docs(spark, n_docs)
    # eval split for decontamination: every 49th doc — 49 is coprime
    # with the clique period (50/200), so a FEW template-clique docs
    # land in eval and the REST stay in train -> the train clique
    # members are real contamination hits (a %50 split would swallow
    # the whole clique into eval and count 0)
    ev = docs.filter(F.col("doc_id") % 49 == 0)
    tr = docs.filter(F.col("doc_id") % 49 != 0)
    # stratum for the mixing op: 4 deterministic hash buckets
    strat = docs.withColumn(
        "lang", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("string")
    )
    fracs = {"0": 0.4, "1": 0.3, "2": 0.2, "3": 0.1}

    # warm codegen/JIT on a tiny slice
    tiny = docs.filter(F.col("doc_id") < 200)
    tiny_ev = tiny.filter(F.col("doc_id") % 49 == 0)
    drop_dup_spans(tiny, "text", "doc_id").count()
    decontaminate(tiny, tiny_ev, "text", "doc_id").count()
    lm_quality_score(tiny, "text", "doc_id").count()

    walls: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, fn):
        t0 = time.time()
        counts[name] = fn()
        walls[name] = round(time.time() - t0, 3)

    run(
        "dropspans",
        lambda: drop_dup_spans(docs, "text", "doc_id").filter(
            F.col("n_removed_spans") > 0
        ).count(),
    )
    run(
        "decon",
        lambda: decontaminate(tr, ev, "text", "doc_id").filter(
            F.col("contaminated")
        ).count(),
    )
    run(
        "lm",
        lambda: lm_quality_score(docs, "text", "doc_id").filter(
            F.col("n_ngrams") > 0
        ).count(),
    )
    run(
        "mixture",
        lambda: mixture_sample(
            strat, "lang", "doc_id", "text", fracs
        ).count(),
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
