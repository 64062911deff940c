"""Per-phase scaling comparison between two scaling-run workdirs.

Each crawl round commits a ``phase_sec`` map into its round_state entry
(see plans/round_loop.py _timed) — this tool turns two run workdirs (e.g.
run-2-0 and run-8-0 from BENCH/run_scaling.py) into a phase-by-phase
speedup table, attributing exactly where an N→4N run loses efficiency.

Usage: python BENCH/phase_compare.py <workdir_N> <workdir_4N> [round=1]
"""

from __future__ import annotations

import json
import os
import sys


def phases(workdir: str, rnd: int) -> dict[str, float]:
    path = os.path.join(workdir, "_round_state", f"commit-{rnd:06d}.json")
    with open(path) as f:
        return json.load(f)["metrics"].get("phase_sec", {})


def main() -> None:
    wd_n, wd_4n = sys.argv[1], sys.argv[2]
    rnd = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    a, b = phases(wd_n, rnd), phases(wd_4n, rnd)
    keys = sorted(set(a) | set(b), key=lambda k: -a.get(k, 0.0))
    ta, tb = sum(a.values()), sum(b.values())
    print(f"{'phase':20s} {'N-cores s':>10s} {'4N-cores s':>10s} {'speedup':>8s}")
    for k in keys:
        va, vb = a.get(k, 0.0), b.get(k, 0.0)
        sp = f"{va / vb:.2f}x" if vb else "-"
        print(f"{k:20s} {va:10.1f} {vb:10.1f} {sp:>8s}")
    print(f"{'TOTAL':20s} {ta:10.1f} {tb:10.1f} {ta / tb:>7.2f}x")


if __name__ == "__main__":
    main()
