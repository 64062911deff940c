"""Per-stage profile of one steady-state crawl round (judge follow-up on the
local[8] -> local[32] scaling cliff): attribute the round's wall time to
Spark stages via the event log, separating executor compute (scales with
cores) from GC, shuffle, and driver/commit gaps (which do not).

Usage:  python BENCH/profile_round.py [--cores 32] [--src <prepared workdir>]
Writes: BENCH/profile_<cores>.json and prints a stage table.

If --src is omitted, a frontier is prepared first (same parameters as
run_scaling.py) and the prepared dir is printed for reuse.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREPARE_SRC = """
import sys
sys.path.insert(0, {repo!r})
from spider_go_spark.session import get_spark
from spider_go_spark.plans.round_loop import CrawlEngine, CrawlConfig
from spider_go_spark.sources.webgraph import make_seeds
spark = get_spark("profile-prepare")
cfg = CrawlConfig(workdir={workdir!r}, n_urls={n_urls}, n_hosts={n_hosts},
                  num_shards={shards}, max_rounds=2, default_budget={budget})
eng = CrawlEngine(spark, cfg)
eng.inject_seeds(make_seeds(spark, {seeds}, cfg.n_urls, cfg.n_hosts))
print("PREPARED", eng.frontier.read().count())
"""

ROUND_SRC = """
import sys, os, time, shutil
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from spider_go_spark.session import get_spark
from spider_go_spark.plans.round_loop import CrawlEngine, CrawlConfig
src, wd = {src!r}, {wd!r}
if os.path.exists(wd): shutil.rmtree(wd)
shutil.copytree(src, wd)
spark = get_spark("profile-round", extra_conf={{
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": "file://{evdir}",
    "spark.eventLog.compress": "false",
    "spark.eventLog.rolling.enabled": "false",
}})
spark.range(1000).select(F.pandas_udf(lambda s: s, "long")("id")).count()  # warm workers
cfg = CrawlConfig(workdir=wd, n_urls={n_urls}, n_hosts={n_hosts},
                  num_shards={shards}, max_rounds=2, default_budget={budget})
eng = CrawlEngine(spark, cfg)
t0 = time.time()
m = eng.run_round(1)
wall = time.time() - t0
print("ROUND", wall, m["n_assigned"], m["n_candidates"], m["n_new"])
spark.stop()
"""


def parse_event_log(evdir: str) -> list[dict]:
    paths = glob.glob(os.path.join(evdir, "*"))
    assert paths, f"no event log in {evdir}"
    path = max(paths, key=os.path.getmtime)
    if os.path.isdir(path):  # Spark 4 rolling event-log layout
        files = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]
    lines = []
    for p in files:
        with open(p) as f:
            lines.extend(f)
    stages: dict[tuple, dict] = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            def blank(stage_id):
                return {
                    "stage_id": stage_id, "name": "?", "tasks": 0,
                    "wall_ms": 0, "run_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                    "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
                    "input_mb": 0.0, "output_mb": 0.0,
                }

            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                s = stages.setdefault(key, blank(si["Stage ID"]))
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                # merge (TaskEnd events for this stage were already folded in)
                s["name"] = si["Stage Name"].split("\n")[0][:80]
                s["tasks"] = si["Number of Tasks"]
                s["wall_ms"] = (comp - sub) if (sub and comp) else 0
            elif ev.get("Event") == "SparkListenerTaskEnd":
                si = ev["Stage ID"], ev["Stage Attempt ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages.setdefault(si, blank(ev["Stage ID"]))
                s["run_ms"] += tm.get("Executor Run Time", 0)
                s["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                s["shuffle_read_mb"] += (sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)) / 1e6
                s["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                s["input_mb"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0) / 1e6
                s["output_mb"] += (tm.get("Output Metrics") or {}).get("Bytes Written", 0) / 1e6
    return sorted(stages.values(), key=lambda s: -s["wall_ms"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--src", default=None, help="prepared frontier workdir to reuse")
    ap.add_argument("--seeds", type=int, default=1_200_000)
    ap.add_argument("--n-urls", type=int, default=8_000_000)
    ap.add_argument("--n-hosts", type=int, default=1_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--budget", type=int, default=4_000_000)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    params = dict(
        repo=REPO, n_urls=args.n_urls, n_hosts=args.n_hosts,
        shards=args.shards, budget=args.budget, seeds=args.seeds,
    )
    env = dict(os.environ)
    src = args.src
    if not src:
        src = tempfile.mkdtemp(prefix="profile-frontier-")
        env.update({"SPARK_GRAFT_CPUS": "32", "SPARK_GRAFT_SHUFFLE_PARTITIONS": "32"})
        out = subprocess.run(
            [sys.executable, "-c", PREPARE_SRC.format(workdir=src, **params)],
            capture_output=True, text=True, env=env, timeout=3000,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        print(out.stdout.strip(), "src:", src, flush=True)

    evdir = tempfile.mkdtemp(prefix="profile-ev-")
    wd = tempfile.mkdtemp(prefix="profile-run-")
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(args.cores),
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": str(args.shuffle_partitions or max(args.cores, 2)),
        }
    )
    out = subprocess.run(
        [sys.executable, "-c", ROUND_SRC.format(src=src, wd=wd, evdir=evdir, **params)],
        capture_output=True, text=True, env=env, timeout=3000,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    round_line = [ln for ln in out.stdout.splitlines() if ln.startswith("ROUND")][0]
    wall = float(round_line.split()[1])
    n_assigned = int(round_line.split()[2])

    stages = parse_event_log(evdir)
    stage_wall = sum(s["wall_ms"] for s in stages) / 1000
    run_total = sum(s["run_ms"] for s in stages) / 1000
    cpu_total = sum(s["cpu_ms"] for s in stages) / 1000
    gc_total = sum(s["gc_ms"] for s in stages) / 1000
    print(f"\ncores={args.cores} wall={wall:.1f}s fetches={n_assigned} "
          f"({n_assigned/wall:.0f} urls/s)")
    print(f"Σ stage wall {stage_wall:.1f}s | driver/commit gaps {wall - stage_wall:.1f}s | "
          f"Σ executor-run {run_total:.1f}s | Σ cpu {cpu_total:.1f}s | Σ gc {gc_total:.1f}s")
    print(f"{'stage':>5} {'wall_s':>7} {'run_s':>8} {'cpu_s':>8} {'gc_s':>6} "
          f"{'shR_MB':>8} {'shW_MB':>8} {'in_MB':>8} {'out_MB':>8}  name")
    for s in stages[:18]:
        print(
            f"{s['stage_id']:>5} {s['wall_ms']/1000:>7.1f} {s['run_ms']/1000:>8.1f} "
            f"{s['cpu_ms']/1000:>8.1f} {s['gc_ms']/1000:>6.1f} "
            f"{s['shuffle_read_mb']:>8.0f} {s['shuffle_write_mb']:>8.0f} "
            f"{s['input_mb']:>8.0f} {s['output_mb']:>8.0f}  {s['name']}"
        )
    payload = {
        "cores": args.cores, "wall_sec": wall, "n_assigned": n_assigned,
        "urls_per_sec": round(n_assigned / wall, 1),
        "stage_wall_sec": round(stage_wall, 1),
        "driver_gap_sec": round(wall - stage_wall, 1),
        "executor_run_sec": round(run_total, 1),
        "executor_cpu_sec": round(cpu_total, 1),
        "gc_sec": round(gc_total, 1),
        "stages": stages,
    }
    with open(os.path.join(REPO, "BENCH", f"profile_{args.cores}.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote BENCH/profile_{args.cores}.json  (src dir for reuse: {src})")


if __name__ == "__main__":
    main()
