"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times individual declared queries with the noop sink against an
arbitrary SF dir, optionally repeating, and can dump
``explain("formatted")`` for plan-diff evidence. ``bench.py`` stays
frozen; numbers from this file are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain-dir DIR]
                        [--no-warmup] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from publicationsretriever_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    if args.explain_dir:
        Path(args.explain_dir).mkdir(parents=True, exist_ok=True)
        for n in names:
            df = qs[n](spark, args.sf)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(args.explain_dir) / f"{n}.txt").write_text(txt)

    if not args.no_warmup:
        for n in names:
            try:
                spark.sparkContext.setJobDescription(f"warmup:{n}")
                qs[n](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"warmup error {n}: {e}", file=sys.stderr)

    out: dict[str, list[float]] = {}
    for r in range(args.repeats):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench:{n}")
            t0 = time.time()
            try:
                qs[n](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                out.setdefault(n, []).append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"bench error {n}: {e}", file=sys.stderr)
                out.setdefault(n, []).append(-1.0)
    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "samples": out,
                "min": {
                    n: min(v) if v else None for n, v in out.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
