"""Two-parallelism scaling benchmark (BASELINE.md target: throughput
scaling efficiency >= 0.8 from N to 4N).

Runs the identical crawl job at local[8] and local[32] in separate
processes (clean JVM each), computes efficiency =
(throughput_32 / throughput_8) / 4, and writes BENCH/BASELINE.md +
BENCH/scaling.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(cores: int, n_urls: int, n_hosts: int, pages_max: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/scaling_worker.py"), str(cores),
         str(n_urls), str(n_hosts), str(pages_max)],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    pages_max = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    lo = run_level(8, n_urls, n_hosts, pages_max)
    hi = run_level(32, n_urls, n_hosts, pages_max)
    eff_fetch = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4
    eff_check = (hi["checked_urls_per_sec"] / lo["checked_urls_per_sec"]) / 4
    report = {
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_fetched": round(eff_fetch, 3),
        "scaling_efficiency_checked": round(eff_check, 3),
        "generated_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(report, indent=2))
    md = f"""# BENCH/BASELINE — measured numbers

## Two-parallelism scaling (sandbox proxy for N vs 4N executors)

Two identical jobs at two local parallelism levels (separate JVMs,
codegen warmed; sandbox proxy per BASELINE.md for N vs 4N executors):

**Job 1 — frontier load stage at scale** ({lo['n_urls']:,} synthesized
URLs through filter battery -> canonicalize -> dedup -> seen anti-join
-> best-per-id -> politeness/quota windows):

| level | wall (s) | checked URLs/sec |
|---|---|---|
| local[8]  | {lo['load_wall_sec']} | {lo['checked_urls_per_sec']:,} |
| local[32] | {hi['load_wall_sec']} | {hi['checked_urls_per_sec']:,} |

**Job 2 — full crawl rounds on the hermetic synthetic web**
({lo['crawl_seed_urls']} seeds, {lo['rounds']} rounds incl. fetch
mapInPandas + page stage):

| level | wall (s) | fetched URLs/sec | rounds/hour |
|---|---|---|---|
| local[8]  | {lo['crawl_wall_sec']} | {lo['fetched_urls_per_sec']} | {lo['rounds_per_hour']} |
| local[32] | {hi['crawl_wall_sec']} | {hi['fetched_urls_per_sec']} | {hi['rounds_per_hour']} |

**Scaling efficiency (throughput_32 / throughput_8) / 4 — target >= 0.8:**
- checked URLs/sec (load stage): **{report['scaling_efficiency_checked']}**
- fetched URLs/sec (full crawl): **{report['scaling_efficiency_fetched']}**

Reproduce: `python tools/bench_scaling.py {lo['n_urls']} {n_hosts} {pages_max}`
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
