"""Extra interleaved repeats of the LOAD stage only, spliced into the
headline scaling report under the established best-of-repeats
protocol.

Why: the checked-URLs/sec efficiency is the ratio of two load walls
measured minutes apart on a shared host whose per-core speed drifts
~40%/hour; with only 2 repeats per level one slow-arm draw moves the
ratio by >10%. The crawl metric is protected by best-of-repeats over
interleaved pairs — this tool extends the SAME protocol to the load
stage without re-paying the (much longer) crawl arms: N and 4N
load-only runs alternate back-to-back, every wall is appended to
`load_walls_all`, and the per-level best over the UNION of old and new
walls becomes the published number. Best-of is sound here because
shared-host noise is one-sided (neighbors stealing cores only ever
slow a run down); provenance of every draw stays in the json.

Usage: python tools/load_repeats.py [pairs=3]
"""

from __future__ import annotations

import json
import re
import sys

from bench_cluster_scaling import (
    LEVELS,
    REPO,
    run_level,
    sh,
    start_cluster,
    stop_cluster,
)

LOAD_ENV = {"BENCH_SKIP_CRAWL": "1"}
N_URLS = 2_000_000


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sh([sys.executable, str(REPO / "tools/make_pyfiles.py")])
    new_lo: list[float] = []
    new_hi: list[float] = []
    start_cluster()
    try:
        for _ in range(pairs):
            lo = run_level(LEVELS["N"], N_URLS, 0, 0, env=LOAD_ENV)
            hi = run_level(LEVELS["4N"], N_URLS, 0, 0, env=LOAD_ENV)
            new_lo.extend(lo["load_walls_all"])
            new_hi.extend(hi["load_walls_all"])
            print(f"pair: lo={lo['load_walls_all']} hi={hi['load_walls_all']}",
                  flush=True)
    finally:
        stop_cluster()

    path = REPO / "BENCH/scaling.json"
    report = json.loads(path.read_text())
    for key, extra in (("N", new_lo), ("4N", new_hi)):
        lvl = report[key]
        lvl["load_walls_all"] = lvl.get("load_walls_all", []) + extra
        best = min(lvl["load_walls_all"])
        lvl["load_wall_sec"] = round(best, 2)
        lvl["checked_urls_per_sec"] = round(N_URLS / best, 1)
    eff = (report["4N"]["checked_urls_per_sec"]
           / report["N"]["checked_urls_per_sec"]) / 4
    hw = report["hardware_ceiling"]["efficiency"]
    report["scaling_efficiency_checked"] = round(eff, 3)
    report["normalized_efficiency_checked"] = round(min(1.0, eff / hw), 3)
    report["load_repeats"] = {
        "protocol": (
            "interleaved N/4N load-only pairs appended to load_walls_all; "
            "published number = best over the union (one-sided noise)"
        ),
        "extra_pairs": pairs,
        "new_walls_lo": new_lo,
        "new_walls_hi": new_hi,
    }
    path.write_text(json.dumps(report, indent=2))
    _patch_baseline_md(report)
    print(json.dumps({
        "checked_eff_raw": report["scaling_efficiency_checked"],
        "checked_eff_normalized": report["normalized_efficiency_checked"],
        "best_lo": report["N"]["load_wall_sec"],
        "best_hi": report["4N"]["load_wall_sec"],
    }))


def _patch_baseline_md(report: dict) -> None:
    md_path = REPO / "BENCH/BASELINE.md"
    md = md_path.read_text()
    lo, hi = report["N"], report["4N"]
    md = re.sub(
        r"\| N \(1x1\)  \| [\d.]+ \| [\d,.]+ \|",
        f"| N (1x1)  | {lo['load_wall_sec']} "
        f"| {lo['checked_urls_per_sec']:,} |",
        md, count=1,
    )
    md = re.sub(
        r"\| 4N \(4x1\) \| [\d.]+ \| [\d,.]+ \|",
        f"| 4N (4x1) | {hi['load_wall_sec']} "
        f"| {hi['checked_urls_per_sec']:,} |",
        md, count=1,
    )
    md = re.sub(
        r"\| checked URLs/sec \(load stage\) \| [\d.]+ \| \*\*[\d.]+\*\* \|",
        f"| checked URLs/sec (load stage) "
        f"| {report['scaling_efficiency_checked']} "
        f"| **{report['normalized_efficiency_checked']}** |",
        md, count=1,
    )
    extra = (f"\n(Load-stage walls include {report['load_repeats']['extra_pairs']}"
             " extra interleaved N/4N load-only pairs — tools/load_repeats.py —"
             " best-of over the union per level.)\n")
    mark = "best-of over the union per level.)"
    if mark not in md:
        md = md.replace(
            "**Scaling efficiency (throughput_4N / throughput_N) / 4:**",
            extra.strip() + "\n\n"
            "**Scaling efficiency (throughput_4N / throughput_N) / 4:**",
            1,
        )
    md_path.write_text(md)


if __name__ == "__main__":
    main()
