"""Round-over-round per-query bench comparison, drift-corrected.

This host's per-core speed drifts ~40%/hour, so raw round-N vs
round-N-1 wall ratios mostly measure the host, not the code.  bench.py
stamps each run with `calib_mhash_per_sec` (single-core hash burn
before+after the suite) and emits `queries_calibrated` — seconds
rescaled to the round-4 anchor speed.  This tool compares two bench
JSONs on the CALIBRATED values and flags real movers.

Usage:
    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
    python bench.py | tee /tmp/b.json && \
        python tools/bench_compare.py BENCH_r04.json /tmp/b.json

Accepts either the driver's wrapper shape ({"parsed": {...}}) or
bench.py's raw stdout line.  Rounds before the calibration stamp
(r1-r3) fall back to raw seconds, flagged UNCAL in the output.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # bench.py stdout capture: one JSON line, possibly after noise
        d = None
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if d is None:
            raise
    return d.get("parsed", d)


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])

    def q(d: dict) -> tuple[dict, bool]:
        cal = d.get("queries_calibrated")
        return (cal, True) if cal else (d["queries"], False)

    qa, cala = q(a)
    qb, calb = q(b)
    tag = "calibrated" if (cala and calb) else "RAW (UNCAL round)"
    common = [n for n in qb if n in qa and qa[n] > 0 and qb[n] > 0]
    rows = sorted(common, key=lambda n: qb[n] / qa[n], reverse=True)
    print(f"# per-query comparison ({tag} seconds), B/A ratio desc")
    print(f"{'query':32s} {'A':>8s} {'B':>8s} {'B/A':>6s}")
    for n in rows:
        r = qb[n] / qa[n]
        flag = " <-- " + ("slower" if r > 1.25 else "faster") if (
            r > 1.25 or r < 0.8
        ) else ""
        print(f"{n:32s} {qa[n]:8.3f} {qb[n]:8.3f} {r:6.2f}{flag}")
    ta = sum(qa[n] for n in common)
    tb = sum(qb[n] for n in common)
    new = [n for n in qb if n not in qa and qb[n] > 0]
    print(f"{'COMMON TOTAL':32s} {ta:8.3f} {tb:8.3f} {tb / ta:6.2f}")
    if new:
        print("new queries:", ", ".join(f"{n}={qb[n]:.3f}s" for n in new))
    out = {
        "common_total_ratio": round(tb / ta, 3),
        "basis": tag,
        "movers": {
            n: round(qb[n] / qa[n], 3)
            for n in rows
            if qb[n] / qa[n] > 1.25 or qb[n] / qa[n] < 0.8
        },
        "new_queries": {n: qb[n] for n in new},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
