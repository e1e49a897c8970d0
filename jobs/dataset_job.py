"""spark-submit entry point for training-dataset assembly: crawl
payloads (input_hint table) -> decode audit -> phash near-dup
clusters -> caption vote -> leakage-safe split -> committed snapshot.

Runs after (or downstream of) jobs/crawl_job.py, against the same
snapshot-catalog machinery, so the dataset is itself an atomic,
resumable, lineage-carrying commit:

    spark-submit --py-files build/publicationsretriever_spark.zip \
        jobs/dataset_job.py --out /shared/dataset-catalog \
        --payloads /shared/payloads.parquet --test-frac 0.1

Sandbox (no external data): omit --payloads and the deterministic
synthetic web's payload store is used; --from-crawl CATALOG restricts
it to the image_ids a committed crawl actually fetched (the exact
production flow: the crawl's payloads table is the dataset's input).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description="training-dataset job")
    ap.add_argument("--out", required=True, help="dataset catalog dir")
    ap.add_argument("--payloads", default=None,
                    help="input_hint parquet path (production input)")
    ap.add_argument("--from-crawl", default=None,
                    help="crawl catalog dir: restrict to its fetched "
                         "image_ids (latest committed snapshot)")
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--pages-max", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--test-frac", type=float, default=0.1)
    ap.add_argument("--max-hamming", type=int, default=2)
    ap.add_argument("--no-audit", action="store_true",
                    help="skip the decode audit pass")
    ap.add_argument("--gates", default=None,
                    help="enable metadata quality gates: a JSON dict "
                         "of image_quality_gates kwargs ('{}' = "
                         "defaults, e.g. '{\"min_dim\": 8}')")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/IPs/phones from the shipped "
                         "captions (textstats.pii_redact patterns)")
    ap.add_argument("--decontaminate-captions", default=None,
                    help="parquet of held-out eval captions (column "
                         "'caption'): pairs whose shipped caption "
                         "shares a span with it are rejected as "
                         "eval_overlap")
    ap.add_argument("--decontaminate-w", type=int, default=5,
                    help="span width (tokens) for caption "
                         "decontamination")
    ap.add_argument("--lm-score", action="store_true",
                    help="attach caption_lm_log10 (corpus-self-"
                         "trained bigram LM score) to pairs")
    ap.add_argument("--alignment-embeddings", default=None,
                    help="parquet with (image_id, image_embedding, "
                         "caption_embedding) from an external encoder; "
                         "pairs below --alignment-threshold cosine are "
                         "rejected as misaligned")
    ap.add_argument("--alignment-threshold", type=float, default=0.3,
                    help="min rounded cosine to keep a pair "
                         "(default 0.3)")
    ap.add_argument("--aspect-buckets", type=int, default=None,
                    help="attach SDXL-style aspect bucket + training "
                         "batch columns (bucket_idx/bucket_w/bucket_h/"
                         "rank_in_bucket/batch_idx) to pairs, batches "
                         "of this size composed per split in "
                         "deterministic hash order")
    ap.add_argument("--wds-out", default=None,
                    help="also pack the final pairs as WebDataset tar "
                         "shards under this dir (train/ and test/ "
                         "subdirs, hash layout for string ids)")
    ap.add_argument("--wds-shard-bytes", type=int, default=1 << 28,
                    help="max data bytes per tar shard (default 256 MB)")
    ap.add_argument("--strip-exif", action="store_true",
                    help="byte-level JPEG EXIF excision on committed "
                         "pair payloads (GPS/serial/timestamp privacy "
                         "hygiene; PNG and corrupt bytes pass through "
                         "untouched, no re-encode) — adds an "
                         "exif_removed count column")
    ap.add_argument("--zorder", default=None,
                    help="comma-separated numeric pair columns (e.g. "
                         "'phash,w') to Z-order-cluster the committed "
                         "pairs table by; also commits a "
                         "pairs_manifest table of per-file min/max "
                         "stats for box-predicate scan pruning")
    ap.add_argument("--zorder-file-bits", type=int, default=4,
                    help="log2 of the z-range file count (default 16 "
                         "files; production ~2^6-2^10)")
    args = ap.parse_args()

    from publicationsretriever_spark.plans.dataset import (
        build_training_dataset,
    )
    from publicationsretriever_spark.session import get_spark
    from publicationsretriever_spark.sources.catalog import SnapshotCatalog

    spark = get_spark(app_name="publicationsretriever-dataset")
    if args.payloads:
        payloads = spark.read.parquet(args.payloads)
    else:
        from publicationsretriever_spark.sources.synthetic_web import (
            SyntheticWeb,
        )

        web = SyntheticWeb(
            seed=args.seed,
            n_hosts=args.hosts,
            pages_per_host_max=args.pages_max,
        )
        payloads = web.payloads_df(spark)
    if args.from_crawl:
        crawl = SnapshotCatalog(args.from_crawl)
        if crawl.latest() is None:
            print(f"no committed snapshot under {args.from_crawl}",
                  file=sys.stderr)
            return 2
        _, crawl_tables = crawl.load(spark)
        payloads = payloads.join(
            crawl_tables["payloads"].select("image_id").distinct(),
            "image_id",
            "semi",
        )

    tables = build_training_dataset(
        spark,
        payloads,
        test_frac=args.test_frac,
        max_hamming=args.max_hamming,
        audit=not args.no_audit,
        gates=json.loads(args.gates) if args.gates is not None else None,
        redact_pii=args.redact_pii,
        decontaminate_captions=(
            spark.read.parquet(args.decontaminate_captions)
            if args.decontaminate_captions
            else None
        ),
        decontaminate_w=args.decontaminate_w,
        lm_score=args.lm_score,
        alignment_embeddings=(
            spark.read.parquet(args.alignment_embeddings)
            if args.alignment_embeddings
            else None
        ),
        alignment_threshold=args.alignment_threshold,
    )
    if args.aspect_buckets:
        # batches must never straddle the leakage-safe split: rank and
        # batch are computed per split, then unioned back
        from publicationsretriever_spark.operators.multimodal import (
            aspect_batch_assign,
        )

        pairs = tables["pairs"]
        parts = [
            aspect_batch_assign(
                pairs.filter(pairs["split"] == split),
                batch_size=args.aspect_buckets,
                layout="hash",
            )
            for split in ("train", "test")
        ]
        tables["pairs"] = parts[0].unionByName(parts[1])

    if args.strip_exif:
        from publicationsretriever_spark.operators.multimodal import (
            strip_exif,
        )

        tables["pairs"] = strip_exif(tables["pairs"])

    if args.zorder:
        # cluster the committed layout so per-file min/max stats stay
        # tight on every listed dim (phash prefix probes, dimension
        # gates); the manifest is committed alongside — the
        # Iceberg-stats analog a scan planner prunes against.
        # Eager cut first (the repo's fan-out convention): without it
        # the full pairs lineage — dedup windows, vote joins, the
        # strip_exif Python pass — runs THREE times (zorder_key's
        # bounds collect, the pairs write, the manifest write).
        from publicationsretriever_spark.operators.packing import (
            zorder_layout,
            zorder_manifest,
        )

        tables["pairs"] = tables["pairs"].localCheckpoint(eager=True)
        zcols = [c.strip() for c in args.zorder.split(",") if c.strip()]
        laid = zorder_layout(
            tables["pairs"], zcols, bits=15,
            file_bits=args.zorder_file_bits,
        )
        tables["pairs"] = laid
        tables["pairs_manifest"] = zorder_manifest(laid, zcols)

    catalog = SnapshotCatalog(args.out)
    snap_id, meta, _ = catalog.write_tables(spark, tables)
    catalog.finish_commit(
        snap_id,
        meta,
        round_no=0,
        lineage={
            "source": args.payloads or "synthetic-web",
            "from_crawl": args.from_crawl,
            "test_frac": args.test_frac,
            "max_hamming": args.max_hamming,
            "audit": not args.no_audit,
            "decontaminate_captions": args.decontaminate_captions,
            "decontaminate_w": args.decontaminate_w,
            "alignment_embeddings": args.alignment_embeddings,
            "alignment_threshold": args.alignment_threshold,
            "zorder": args.zorder,
            "zorder_file_bits": args.zorder_file_bits,
            "strip_exif": args.strip_exif,
        },
    )
    wds_manifest = None
    if args.wds_out:
        # the loader-facing packed form: one WebDataset tar shard set
        # per split, laid out by (xxhash64(image_id), image_id) — the
        # string-id path — reading the committed snapshot back so the
        # shards reflect the atomically committed rows
        from publicationsretriever_spark.sources.webdataset import (
            write_webdataset,
        )

        _, committed_tables = catalog.load(spark, snapshot_id=snap_id)
        committed = committed_tables["pairs"]
        wds_manifest = {}
        for split in ("train", "test"):
            part = committed.filter(committed["split"] == split)
            if part.limit(1).count() == 0:
                wds_manifest[split] = []
                continue
            wds_manifest[split] = write_webdataset(
                part,
                os.path.join(args.wds_out, split),
                shard_max_bytes=args.wds_shard_bytes,
                layout="hash",
            )

    out = {
        "snapshot": snap_id,
        "tables": {n: m["rows"] for n, m in meta.items()},
    }
    if wds_manifest is not None:
        out["wds"] = {
            s: {
                "shards": len(ms),
                "samples": sum(m["n_samples"] for m in ms),
            }
            for s, ms in wds_manifest.items()
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
