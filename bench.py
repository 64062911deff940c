"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a synthetic-frontier
crawl-throughput round, and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl": {...}}

Queries are materialized with a noop write (full computation, no driver
collect) so projection-heavy queries aren't pruned away by count().
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, sized to run at sf0.1 in seconds.
HEADLINE = [
    "pricing_summary",        # hash agg
    "region_revenue",         # broadcast star join
    "topk_orders",            # top-k
    "politeness_window_cut",  # window budget cut (the scheduler op)
    "anti_join_unseen",       # seen-set anti join
    "token_fanout",           # explode fan-out
    "lag_interevent_gap",     # analytic window
    "tumbling_window_counts", # time bucketing
    "dedup_exact",            # exact dedup
    "token_stats",            # text kernel map stage
    "minhash_lsh_pairs",      # MinHash+LSH near-dup
    "ann_cosine_topk",        # brute-force ANN
    "ann_lsh_buckets",        # LSH bucketing
    "media_features",         # Arrow mapInPandas multimodal stage
    "asof_last_click",        # as-of join (union + running window)
    "hll_distinct_users",     # HyperLogLog sketch agg
    "histogram_quantiles",    # no-sort approximate percentiles
    "repetition_quality",     # Gopher repetition filter (bigram mode)
    "pagerank_top20",         # iterative integer PageRank (5 rounds)
    "pack_sequences",         # sequence packing window
    "text_normalize",         # cleaning stage (pure codegen projection)
    "inverted_index_topterms",# explode → doc-freq agg → posting-head window
    "dup_ngram_fraction",     # substring-dup filter (window-hash equi-join)
    "bigram_lm_score",        # corpus LM model + re-join scoring
    "kmeans_step",            # broadcast-centroid Lloyd iteration
    "pq_ann_topk",            # product-quantization ADC shortlist + rerank
    "chunk_documents",        # doc→chunk window explosion (map-only fan-out)
    "filter_funnel",          # corpus filter yield report (md5-keyed dup agg)
    "hits_top_nodes",         # iterative integer HITS (3 rounds, 2 shuffles each)
    "frontier_pagerank_rerank",  # authority-weighted frontier reorder
]

# Crawl throughput bench: frontier sized so vectorized work dominates the
# per-round fixed costs (~150k fetches over 3 rounds, ~1 min on 32 cores).
CRAWL_N_URLS = 200_000
CRAWL_N_HOSTS = 200
CRAWL_SEEDS = 20_000
CRAWL_ROUNDS = 3
CRAWL_BUDGET = 100_000  # per-host budget high enough to be frontier-bound
CRAWL_SHARDS = 32


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from spider_go_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("spider-go-spark-bench")
    qs = entry_mod.queries()

    # untimed JVM/codegen warm-up: a scan + shuffle + noop write so the
    # first timed query doesn't absorb session bring-up (~5-10 s of JIT,
    # Arrow allocator and committer init that no operator owns)
    warm = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    materialize(warm.repartition(4, "n_regionkey").groupBy("n_regionkey").count())

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        materialize(fn(spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    # crawl throughput: full engine rounds on the synthetic graph
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    workdir = tempfile.mkdtemp(prefix="bench-crawl-")
    try:
        cfg = CrawlConfig(
            workdir=workdir,
            n_urls=CRAWL_N_URLS,
            n_hosts=CRAWL_N_HOSTS,
            num_shards=CRAWL_SHARDS,
            max_rounds=CRAWL_ROUNDS,
            default_budget=CRAWL_BUDGET,
        )
        eng = CrawlEngine(spark, cfg)
        t0 = time.time()
        history = eng.crawl(seeds=make_seeds(spark, CRAWL_SEEDS, CRAWL_N_URLS, CRAWL_N_HOSTS))
        crawl_sec = time.time() - t0
        n_fetched = sum(h.get("n_fetched", 0) for h in history)
        n_deduped = sum(h.get("n_candidates", 0) for h in history)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    times["crawl_3_rounds"] = round(crawl_sec, 3)

    # steady-state round: one big fetch round on a prepared 280k-URL
    # frontier — the sustained-throughput figure (seed injection and
    # termination excluded; matches the BENCH/run_scaling.py workload shape)
    workdir2 = tempfile.mkdtemp(prefix="bench-steady-")
    try:
        from spider_go_spark.plans.round_loop import CrawlConfig as _CC
        from spider_go_spark.plans.round_loop import CrawlEngine as _CE

        cfg2 = _CC(
            workdir=workdir2, n_urls=2_000_000, n_hosts=500, num_shards=64,
            max_rounds=2, default_budget=1_000_000,
        )
        eng2 = _CE(spark, cfg2)
        eng2.inject_seeds(make_seeds(spark, 300_000, cfg2.n_urls, cfg2.n_hosts))
        t0 = time.time()
        m2 = eng2.run_round(1)
        steady_sec = time.time() - t0
    finally:
        shutil.rmtree(workdir2, ignore_errors=True)
    times["crawl_steady_round"] = round(steady_sec, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_ops_plus_crawl_rounds_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": {
            "n_urls_fetched": n_fetched,
            "n_candidates_deduped": n_deduped,
            "rounds": CRAWL_ROUNDS,
            "wall_sec": round(crawl_sec, 3),
            "urls_fetched_per_sec": round(n_fetched / crawl_sec, 2) if crawl_sec else None,
            "candidates_deduped_per_sec": round(n_deduped / crawl_sec, 2) if crawl_sec else None,
        },
        "crawl_steady_round": {
            "n_urls_fetched": m2["n_fetched"],
            "n_candidates_deduped": m2["n_candidates"],
            "wall_sec": round(steady_sec, 3),
            "urls_fetched_per_sec": round(m2["n_fetched"] / steady_sec, 2) if steady_sec else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
