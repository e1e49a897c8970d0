"""spark-submit entry point for the distributed crawl (north rule:
"submitted via spark-submit --py-files ... resumable from checkpoint").

The package ships as a zip on --py-files; this driver file is the
application script. The SparkSession comes from spark-submit's conf
(master/executors set by the cluster submit command), so the same job
runs unmodified on local[N] or a 1000-executor cluster.

Usage (cluster):

    python tools/make_pyfiles.py build/publicationsretriever_spark.zip
    spark-submit --py-files build/publicationsretriever_spark.zip \
        jobs/crawl_job.py --catalog /shared/crawl-catalog \
        --rounds 10 --hosts 500 --pages-max 50

Resume after interruption (exact, from the last committed snapshot):

    spark-submit --py-files build/publicationsretriever_spark.zip \
        jobs/crawl_job.py --catalog /shared/crawl-catalog \
        --rounds 10 --hosts 500 --pages-max 50 --resume

In this sandbox the fetch surface is the deterministic synthetic web
(sources/synthetic_web.py); on a real deployment the fetch mapInPandas
UDF (plans/rounds.py) is the single place to swap in live HTTP.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# package may arrive via --py-files zip OR the repo checkout
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description="distributed crawl job")
    ap.add_argument("--catalog", required=True, help="snapshot catalog dir")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--pages-max", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--host-quota", type=int, default=50)
    ap.add_argument("--resume", action="store_true",
                    help="continue exactly from the latest snapshot")
    ap.add_argument("--use-mla", action="store_true",
                    help="enable path-MLA prediction + A8 gate "
                         "(reference default is off)")
    ap.add_argument("--bloom-threshold", type=int, default=2_000_000,
                    help="seen-keys above which the bloom prefilter kicks in")
    ap.add_argument("--sharded-threshold", type=int, default=None,
                    help="seen-keys above which the sharded cogrouped "
                         "probe replaces the whole-set sketch")
    ap.add_argument("--input-url", default=None,
                    help="fetch the JSON-lines id/url seed list from "
                         "this URL instead of the synthetic-web seeds "
                         "(reference -inputDataUrl, "
                         "util/args/ArgsUtils.java:103-107)")
    args = ap.parse_args()

    from publicationsretriever_spark.plans.rounds import CrawlEngine
    from publicationsretriever_spark.session import get_spark
    from publicationsretriever_spark.sources.catalog import SnapshotCatalog
    from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb

    spark = get_spark(app_name="publicationsretriever-crawl")
    web = SyntheticWeb(
        seed=args.seed, n_hosts=args.hosts, pages_per_host_max=args.pages_max
    )
    engine = CrawlEngine(
        spark, web, num_buckets=args.buckets, host_quota=args.host_quota,
        use_mla=args.use_mla, bloom_threshold=args.bloom_threshold,
        sharded_threshold=args.sharded_threshold,
    )
    catalog = SnapshotCatalog(args.catalog)
    resume = args.resume
    if resume and catalog.latest() is None:
        # --resume against a catalog with no committed snapshot (e.g. the
        # first run died before round 0 published): fall back to a fresh
        # crawl instead of a raw FileNotFoundError from catalog.load
        print(
            f"no committed snapshot under {args.catalog}; starting fresh",
            file=sys.stderr,
        )
        resume = False
    if resume:
        # a resumed crawl continues from the snapshot's own frontier;
        # say so explicitly when the operator ALSO passed seeds, or
        # the flag is dropped with no signal at all
        if args.input_url:
            print(
                "--resume: continuing from the committed snapshot; "
                f"--input-url {args.input_url} is IGNORED (seed lists "
                "only apply to a fresh crawl)",
                file=sys.stderr,
            )
        seeds = None
    elif args.input_url:
        from publicationsretriever_spark.sources.seeds import (
            read_id_url_pairs_from_url,
        )

        seeds = read_id_url_pairs_from_url(spark, args.input_url).select(
            "id", "order_in_id", "url"
        )
    else:
        seeds = web.seeds_df(spark)
    state = engine.crawl(
        seeds,
        max_rounds=args.rounds,
        catalog=catalog,
        resume=resume,
    )
    summary = {
        "rounds_run": len(state.metrics),
        "last_round": state.metrics[-1]["round"] if state.metrics else None,
        "results_total": sum(m["results"] for m in state.metrics),
        "seen_total": state.metrics[-1]["seen_total"] if state.metrics else 0,
        "snapshots": [s["snapshot_id"] for s in catalog.snapshots()],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
