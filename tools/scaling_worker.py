"""One scaling-benchmark run at a fixed parallelism level.

Usage: python tools/scaling_worker.py <cores> [n_urls] [n_hosts] [pages_max]

Two measured jobs, identical input at every parallelism level:

1. LOAD STAGE at scale — `n_urls` synthesized URLs (generated JVM-side
   from spark.range: zipfian hosts, battery-reject mix) pushed through
   the full frontier preparation: filter battery -> clean/canonicalize
   (Arrow UDF) -> hash/bucket -> in-round dedup -> seen anti-join ->
   best-url-per-id -> politeness/quota windows. Metric: checked URLs/sec.
2. FULL CRAWL on the hermetic synthetic web (n_hosts/pages_max) —
   2 rounds incl. fetch mapInPandas + page stage. Metric: fetched
   URLs/sec + rounds/hour.

Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_urls(spark, n: int, cores: int):
    """JVM-side URL synthesis: zipf-ish hosts + reject-battery mix."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, cores * 4)
    host = F.concat(
        F.lit("host"),
        F.pmod(F.pmod(F.col("id") * 2654435761, F.lit(997)), F.lit(500)),
        F.lit(".example.org"),
    )
    kind = F.pmod(F.col("id"), F.lit(10))
    url = (
        F.when(kind == 0, F.concat(F.lit("https://"), host, F.lit("/files/"), F.col("id"), F.lit("/fulltext.pdf")))
        .when(kind == 1, F.concat(F.lit("https://"), host, F.lit("/article/download/"), F.col("id")))
        .when(kind == 2, F.concat(F.lit("https://"), host, F.lit("/handle/123/"), F.col("id")))
        .when(kind == 3, F.concat(F.lit("https://doi.org/10.1234/x."), F.col("id")))
        .when(kind == 4, F.concat(F.lit("https://"), host, F.lit("/article/"), F.col("id"), F.lit("?jsessionid=AB"), F.col("id"), F.lit("&p=2")))
        .when(kind == 5, F.concat(F.lit("https://www.facebook.com/p/"), F.col("id")))
        .when(kind == 6, F.concat(F.lit("https://"), host, F.lit("/login")))
        .when(kind == 7, F.concat(F.lit("https://"), host, F.lit("/css/s"), F.col("id"), F.lit(".css")))
        .when(kind == 8, F.concat(F.lit("https://"), host, F.lit("/")))
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/article/"), F.col("id")))
    )
    return df.select(
        F.pmod(F.col("id"), F.lit(n // 3 + 1)).cast("string").alias("id"),
        F.col("id").alias("order_in_id"),
        url.alias("url"),
    )


def run_load_stage(spark, engine_cls, n_urls: int, cores: int) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.besturl import pick_best_url_per_id
    from publicationsretriever_spark.operators.seen import filter_unseen
    from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb

    web = SyntheticWeb(seed=1, n_hosts=2, pages_per_host_max=2)
    engine = engine_cls(spark, web, num_buckets=cores * 4)
    seeds = synth_urls(spark, n_urls, cores)
    seen = spark.range(0, n_urls // 2, 1, cores * 4).select(
        F.xxhash64(F.concat(F.lit("https://hostx.example.org/a/"), F.col("id"))).alias("url_hash")
    )

    def job():
        staged = engine.prepare_frontier(
            seeds.withColumn("depth", F.lit(0)).withColumn("kind", F.lit("seed")),
            round_no=0,
        )
        ok = staged.filter(F.col("reject_reason").isNull())
        w = Window.partitionBy("url_hash").orderBy("order_in_id", "id")
        ok = ok.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        unseen = filter_unseen(ok, seen, "url_hash", seen_count=n_urls // 2)
        best = pick_best_url_per_id(unseen).filter(F.col("is_best"))
        wq = Window.partitionBy("top3").orderBy("priority", "url_hash")
        sched = best.withColumn("_slot", F.row_number().over(wq))
        return sched.select(F.count(F.lit(1))).collect()[0][0]

    job_small = synth_urls(spark, 10_000, cores)  # warm codegen
    _ = engine.prepare_frontier(
        job_small.withColumn("depth", F.lit(0)).withColumn("kind", F.lit("seed")), 0
    ).filter(F.col("reject_reason").isNull()).count()

    t0 = time.time()
    n_sched = job()
    wall = time.time() - t0
    return {
        "n_urls": n_urls,
        "load_wall_sec": round(wall, 2),
        "scheduled": n_sched,
        "checked_urls_per_sec": round(n_urls / wall, 1),
    }


def run_crawl(spark, engine_cls, n_hosts: int, pages_max: int, cores: int) -> dict:
    from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb

    web = SyntheticWeb(seed=42, n_hosts=n_hosts, pages_per_host_max=pages_max)
    engine = engine_cls(spark, web, num_buckets=cores * 4, host_quota=10**9)
    seeds = web.seeds_df(spark).repartition(cores * 4).cache()
    seeds.count()
    # warm-up: one tiny crawl pays codegen
    engine_cls(spark, web, num_buckets=cores * 4).crawl(seeds.limit(100), max_rounds=1)

    t0 = time.time()
    state = engine.crawl(seeds, max_rounds=2)
    wall = time.time() - t0
    fetched = sum(m["fetched"] for m in state.metrics)
    return {
        "crawl_seed_urls": seeds.count(),
        "crawl_wall_sec": round(wall, 2),
        "urls_fetched": fetched,
        "fetched_urls_per_sec": round(fetched / wall, 1),
        "rounds": len(state.metrics),
        "rounds_per_hour": round(len(state.metrics) / wall * 3600, 1),
    }


def main() -> None:
    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    pages_max = int(sys.argv[4]) if len(sys.argv) > 4 else 400

    from publicationsretriever_spark.plans.rounds import CrawlEngine
    from publicationsretriever_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=cores
    )
    out = {"cores": cores}
    out.update(run_load_stage(spark, CrawlEngine, n_urls, cores))
    out.update(run_crawl(spark, CrawlEngine, n_hosts, pages_max, cores))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
