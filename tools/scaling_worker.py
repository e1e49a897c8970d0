"""One scaling-benchmark run at a fixed parallelism level.

Usage: python tools/scaling_worker.py <cores> [n_hosts] [pages_max]
Prints one JSON line: {"cores": N, "urls": n, "wall_sec": s,
"urls_per_sec": r, "rounds": k, "rounds_per_hour": h}.

The job is the FULL crawl round pipeline (gate -> canon -> dedup ->
re-cross -> quota -> host-bucketed fetch -> classify -> link stage)
over a zipfian synthetic web — identical input at every parallelism
level (seed-deterministic).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    pages_max = int(sys.argv[3]) if len(sys.argv) > 3 else 600

    from publicationsretriever_spark.plans.rounds import CrawlEngine
    from publicationsretriever_spark.session import get_spark
    from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb

    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=cores
    )
    web = SyntheticWeb(seed=42, n_hosts=n_hosts, pages_per_host_max=pages_max)
    engine = CrawlEngine(spark, web, num_buckets=cores * 4, host_quota=10**9)
    seeds = web.seeds_df(spark).repartition(cores * 4).cache()
    n_seeds = seeds.count()

    # warm-up round on a slice: pays codegen/JIT once so the measured
    # run is steady-state compute (what a long-running cluster job sees)
    warm = CrawlEngine(spark, web, num_buckets=cores * 4, host_quota=10**9)
    warm.crawl(seeds.limit(200), max_rounds=1)

    t0 = time.time()
    state = engine.crawl(seeds, max_rounds=2)
    wall = time.time() - t0
    fetched = sum(m["fetched"] for m in state.metrics)
    checked = sum(m["frontier_in"] for m in state.metrics)
    rounds = len(state.metrics)
    print(
        json.dumps(
            {
                "cores": cores,
                "seed_urls": n_seeds,
                "urls_checked": checked,
                "urls_fetched": fetched,
                "wall_sec": round(wall, 2),
                "fetched_urls_per_sec": round(fetched / wall, 1),
                "checked_urls_per_sec": round(checked / wall, 1),
                "rounds": rounds,
                "rounds_per_hour": round(rounds / wall * 3600, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
