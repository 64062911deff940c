"""Round-over-round BENCH comparison that is conclusive either way.

BENCH_r02's crawl figures were single-shot on a host with a measured 2.8×
wall-time spread (BENCH/BASELINE.md "Measured noise magnitude"), so a naive
old-vs-new percent diff is unfalsifiable. This comparator uses the round-3
protocol's extra evidence (best-of-N rep walls + per-phase breakdowns,
bench.py) to classify each drift:

- REAL          — the older value lies outside the newer run's rep spread
                  widened by the documented noise factor; the largest
                  per-phase delta is named (attribution).
- NOISE         — the older value lies inside the newer rep spread (or
                  spread × noise factor): the drift is explained by the
                  host, not the engine.
- INCONCLUSIVE  — neither side carries reps/phases (two single-shots).

Usage: python tools/compare_bench.py OLD.json NEW.json
Exits 0 always (this is a report, not a gate).
"""

from __future__ import annotations

import json
import sys

# measured same-commit wall spread on this host (BENCH/BASELINE.md): the
# 278k round ran 32-90 s across 3 h. Single-shot figures inherit it.
HOST_NOISE_FACTOR = 2.8


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def classify(old_wall: float, new_entry: dict) -> tuple[str, str]:
    reps = new_entry.get("rep_walls_sec") or new_entry.get("walls_sec")
    if not reps:
        return "INCONCLUSIVE", "two single-shot figures on a noisy host"
    lo, hi = min(reps), max(reps)
    if lo <= old_wall <= hi:
        return "NOISE", f"old value inside new rep spread [{lo:.1f}, {hi:.1f}]"
    if lo / HOST_NOISE_FACTOR <= old_wall <= hi * HOST_NOISE_FACTOR:
        return "NOISE", (
            f"old value within documented {HOST_NOISE_FACTOR}x host noise of "
            f"new rep spread [{lo:.1f}, {hi:.1f}]"
        )
    phases = new_entry.get("phase_sec") or {}
    top = max(phases, key=phases.get) if phases else "n/a"
    return "REAL", f"outside noise envelope; largest new-run phase: {top}"


def main(old_path: str, new_path: str) -> None:
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"{'query':34s} {'old s':>8s} {'new s':>8s} {'delta':>8s}")
    for name in sorted(set(oq) & set(nq)):
        d = (nq[name] - oq[name]) / oq[name] * 100 if oq[name] else 0.0
        print(f"{name:34s} {oq[name]:8.2f} {nq[name]:8.2f} {d:+7.1f}%")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new-only queries: {', '.join(only_new)}")

    for key in ("crawl", "crawl_steady_round"):
        o, n = old.get(key), new.get(key)
        if not (o and n):
            continue
        verdict, why = classify(o["wall_sec"], n)
        print(
            f"\n{key}: old {o['wall_sec']:.1f}s → new {n['wall_sec']:.1f}s "
            f"(best-of-{len(n.get('rep_walls_sec', n.get('walls_sec', [])) or [1])})"
            f"\n  verdict: {verdict} — {why}"
        )
        for side, e in (("old", o), ("new", n)):
            ph = e.get("phase_sec")
            if ph:
                tot = sum(ph.values())
                parts = ", ".join(f"{k}={v:.1f}" for k, v in sorted(ph.items(), key=lambda kv: -kv[1]))
                print(f"  {side} phases ({tot:.1f}s): {parts}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
