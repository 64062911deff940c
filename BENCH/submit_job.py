"""spark-submit entry point (north rule: "run via spark-submit --py-files
on a multi-executor cluster").

Usage:
    cd /root/repo && zip -r /tmp/spider_go_spark.zip spider_go_spark
    spark-submit --master local[8] \
        --py-files /tmp/spider_go_spark.zip \
        BENCH/submit_job.py --workdir /tmp/submit-crawl --seeds 2000

On a real cluster only --master/--deploy-mode change; the package ships to
executors via --py-files and the session factory honours the cluster's
master (SPARK_GRAFT_ON_CLUSTER=1 skips the local[] default).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", type=int, default=2_000)
    ap.add_argument("--n-urls", type=int, default=20_000)
    ap.add_argument("--n-hosts", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    # imports resolve from the --py-files zip on executors
    from pyspark.sql import SparkSession

    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    spark = SparkSession.builder.appName("spider-go-spark-submit").getOrCreate()
    cfg = CrawlConfig(
        workdir=args.workdir, n_urls=args.n_urls, n_hosts=args.n_hosts,
        num_shards=16, max_rounds=args.rounds, default_budget=10_000,
    )
    eng = CrawlEngine(spark, cfg)
    t0 = time.time()
    history = eng.crawl(seeds=make_seeds(spark, args.seeds, cfg.n_urls, cfg.n_hosts))
    wall = time.time() - t0
    n_fetched = sum(h.get("n_fetched", 0) for h in history)
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "rounds": len(history),
                "n_fetched": n_fetched,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(n_fetched / wall, 1) if wall else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
