"""Two-cluster-size scaling for the ROUND-5 CLOSING operators
(Z-order layout + manifest, cross-modal retrieval recall@k,
conditional-GET revalidation merge) — same protocol as
tools/bench_ops_scaling.py, separate artifacts so the earlier ops'
committed evidence is never overwritten.

Writes BENCH/ops7_scaling.json and the "## Round-5 closing-ops scaling"
section of BENCH/BASELINE.md.

Usage: python tools/bench_ops7_scaling.py [n_docs] [repeats]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from bench_cluster_scaling import (  # noqa: E402
    LEVELS,
    MASTER,
    SPARK_HOME,
    hardware_ceiling,
    sh,
    start_cluster,
    stop_cluster,
)

MARK = "## Round-5 closing-ops scaling"


def run_level(n_exec: int, n_docs: int) -> dict:
    out = sh(
        [
            f"{SPARK_HOME}/bin/spark-submit",
            "--master", MASTER,
            "--conf", f"spark.cores.max={n_exec}",
            "--conf", "spark.executor.cores=1",
            "--conf", "spark.executor.memory=6g",
            "--conf", "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=1",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.local.dir=/dev/shm/spark-tmp",
            "--py-files", str(REPO / "build/publicationsretriever_spark.zip"),
            str(REPO / "tools/ops7_scaling_worker.py"),
            str(n_exec), str(n_docs),
        ]
    )
    line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo, hi = LEVELS["N"], LEVELS["4N"]
    factor = hi / lo

    hw = hardware_ceiling()
    start_cluster()
    runs: list[tuple[int, dict]] = []
    try:
        for _ in range(repeats):  # interleaved lo/hi pairs
            runs.append((lo, run_level(lo, n_docs)))
            runs.append((hi, run_level(hi, n_docs)))
    finally:
        stop_cluster()

    def best(n_exec: int) -> dict:
        cands = [r for e, r in runs if e == n_exec]
        return min(cands, key=lambda r: r["total_wall"])

    b_lo, b_hi = best(lo), best(hi)
    per_op = {}
    for op in b_lo["walls"]:
        raw = (b_lo["walls"][op] / b_hi["walls"][op]) / factor
        per_op[op] = {
            "wall_lo": b_lo["walls"][op],
            "wall_hi": b_hi["walls"][op],
            "efficiency_raw": round(raw, 3),
            "efficiency_normalized": round(
                min(1.0, raw / hw["efficiency"]), 3
            ),
        }
    total_raw = (b_lo["total_wall"] / b_hi["total_wall"]) / factor
    result = {
        "topology": {
            "N": f"{lo} executors x 1 cores",
            "4N": f"{hi} executors x 1 cores",
            "mode": "standalone cluster on localhost, separate executor JVMs",
        },
        "n_docs": n_docs,
        "repeats": repeats,
        "protocol": "interleaved N/4N pairs, best-of per level",
        "hardware_ceiling": hw,
        "per_op": per_op,
        "total_wall_lo": b_lo["total_wall"],
        "total_wall_hi": b_hi["total_wall"],
        "scaling_efficiency_total_raw": round(total_raw, 3),
        "scaling_efficiency_total_normalized": round(
            min(1.0, total_raw / hw["efficiency"]), 3
        ),
        "counts_equal_across_levels": b_lo["counts"] == b_hi["counts"],
        "all_runs": [
            {"n_executors": e, **r} for e, r in runs
        ],
    }
    bench = REPO / "BENCH"
    (bench / "ops7_scaling.json").write_text(json.dumps(result, indent=2))

    lines = [MARK, ""]
    lines.append(
        "Scaling evidence for the ROUND-5 closing operators (Z-order "
        "layout + manifest, retrieval recall@k, revalidation merge) "
        "on the same "
        f"standalone cluster protocol at {lo} vs {hi} single-core "
        f"executors ({n_docs} synthesized docs, interleaved pairs "
        "best-of per level). Results identical across levels "
        f"(checked: {result['counts_equal_across_levels']})."
    )
    lines.append("")
    lines.append("| op | wall N (s) | wall 4N (s) | raw eff | normalized |")
    lines.append("|---|---|---|---|---|")
    for op, r in per_op.items():
        lines.append(
            f"| {op} | {r['wall_lo']} | {r['wall_hi']} | "
            f"{r['efficiency_raw']} | {r['efficiency_normalized']} |"
        )
    lines.append(
        f"| **total** | {b_lo['total_wall']} | {b_hi['total_wall']} | "
        f"**{result['scaling_efficiency_total_raw']}** | "
        f"**{result['scaling_efficiency_total_normalized']}** |"
    )
    lines.append("")

    baseline = bench / "BASELINE.md"
    text = baseline.read_text()
    if MARK in text:
        head, _, rest = text.partition(MARK)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1:] if nxt != -1 else ""
        text = head + "\n".join(lines) + tail
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    baseline.write_text(text)
    print(json.dumps({
        "total_raw": result["scaling_efficiency_total_raw"],
        "total_normalized": result["scaling_efficiency_total_normalized"],
        "per_op": {k: v["efficiency_raw"] for k, v in per_op.items()},
    }))


if __name__ == "__main__":
    main()
