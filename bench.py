"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus crawl-throughput
rounds, and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl": {...}, ...}

Queries are materialized with a noop write (full computation, no driver
collect) so projection-heavy queries aren't pruned away by count().

Regression detectability (round-3 protocol): this host shows bursty
hypervisor steal that can inflate a single-shot crawl figure 2.8× (measured
in BENCH/BASELINE.md), so the crawl entries now run PINNED (taskset over
exactly the advertised cores, so stray host load can't donate extra cores)
and BEST-OF-N with every rep's wall time and per-phase breakdown emitted —
a round-over-round diff attributes to a phase or is dismissed as noise by
the rep spread, instead of being unfalsifiable.
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
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

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
    "cdx_prefix_scan",        # SURT key projection + index dedup + range scan
    "anchor_text_topk",       # span HOF extraction + (href, term) agg
    "image_ahash_groups",     # Arrow encode→byte-decode→aHash→dedup groups
    "seed_distance_bfs",      # iterative BFS reachability (3 hops)
    "line_dup_stats",         # CCNet line-dedup per-doc report (3 keyed shuffles)
    "multimodal_pack_synth",  # span packing via in-array prefix fold (no window)
    "oov_rate",               # vocab build + broadcast coverage scoring
    "host_pagerank_top",      # weighted PageRank on the collapsed host graph
    "rp_ann_topk",            # JL random-projection shortlist + exact rerank
    "dsir_importance",        # hashed-unigram model build + broadcast re-join
    "gopher_rules_filter",    # published rule gate (pure per-mille projection)
    "phrase_match",           # positional phrase query (map-only HOF fold)
    "host_trustrank_top",     # seed-scoped trust propagation (spam demotion)
    "bm25_topk",              # integer-log BM25 over pre-filtered postings
    "lm_dirichlet_topk",      # query-likelihood ranking (2nd scoring family)
    "domain_farm_audit",      # PSL eTLD+1 cascade + domain-keyed agg
    "redirect_resolution",    # pointer-doubling chain resolve (log-round joins)
    "opic_top20",             # online importance: cash/history + pot rounds
    "host_spam_mass",         # PageRank + TrustRank composed over one edge set
    "neighbourhood_function", # HyperBall register-max ball propagation (4 hops)
    "bowtie_structure",       # forward+backward BFS census from the hub
    "minmax_pruning_audit",   # Z-order vs natural layout file-skipping audit
    "token_shard_samples",    # tokenize→fixed-width chunk→pad (shard projection)
    "trigram_sbo_score",      # trigram Stupid-Backoff LM (3 models + 5 joins)
    "lpa_communities",        # synchronous frequency-LPA communities (3 rounds)
    "pca_power_iteration",    # covariance-free integer power iteration
    "scd2_event_type_history",# gaps-and-islands SCD2 dimension history
    "cluster_capped_sample",  # per-cluster diversity cap (argmin + top-k)
    "prf_expanded_topk",      # two-pass PRF query expansion (posting plans)
    "bitext_candidates",      # rare-anchor cross-language pair mining
    "round_novelty_report",   # first-seen shingle rate per round
    "hll_cumulative_users",   # prefix-merged weekly HLL registers
]

# Crawl throughput bench: frontier sized so vectorized work dominates the
# per-round fixed costs (~150k fetches over 3 rounds).
CRAWL_N_URLS = 200_000
CRAWL_N_HOSTS = 200
CRAWL_SEEDS = 20_000
CRAWL_ROUNDS = 3
CRAWL_BUDGET = 100_000  # per-host budget high enough to be frontier-bound
CRAWL_SHARDS = 32

# Steady-state round workload (matches BENCH/run_scaling.py's shape).
STEADY_N_URLS = 2_000_000
STEADY_N_HOSTS = 500
STEADY_SEEDS = 300_000
STEADY_SHARDS = 64
STEADY_BUDGET = 1_000_000

# Tiered-scheduling evidence: a frontier MUCH larger than the round so the
# O(frontier)-vs-O(hot) scheduling cost is visible (the throughput benches
# above fetch their whole frontier each round, hiding it). Two frontier
# sizes prove the asymptotics, not just a ratio: untiered per-round cost
# grows with the frontier, tiered stays flat (bounded by hosts × R × B).
TIER_N_URLS = 8_000_000
TIER_N_HOSTS = 400
TIER_SEED_SIZES = (800_000, 1_600_000)
TIER_BUDGET = 50          # 400 hosts × 50 = 20k fetches/round
TIER_ROUNDS = 3
TIER_R = 4                # hot tier holds 4 rounds of budget per host


# Flow-DAG interpreter throughput: the reference's core product surface.
# A 3-hop chain with a 1→3 fan-out; deliveries = triggers × (1 + 1 + 3).
FLOW_TRIGGERS = 200_000


def _flow_bench_setup():
    """(catalog, workers): a 3-hop chain with a 1→3 fan-out over natively
    vectorized workers — shared by the batch and streaming flow benches."""
    import numpy as np
    import pandas as pd

    from spider_go_spark.functions.mapper import Mapper
    from spider_go_spark.plans.flow import FlowCatalog, Worker

    def echo(pdf: "pd.DataFrame", cfg: dict) -> "pd.DataFrame":
        return pd.DataFrame(
            {"task_id": pdf["task_id"], "meta_output": "success",
             "value": pdf["value"] + "_x"}
        )

    def fan3(pdf: "pd.DataFrame", cfg: dict) -> "pd.DataFrame":
        rep = pdf.loc[pdf.index.repeat(3)]
        k = np.tile(np.arange(3), len(pdf)).astype(str)
        return pd.DataFrame(
            {"task_id": rep["task_id"].to_numpy(), "meta_output": "success",
             "item": rep["value"].to_numpy() + "@" + k}
        )

    cat = (
        FlowCatalog("bench")
        .add_action("a1", "trigger-action")
        .add_action("a2", "echo", mapper={"value": Mapper("key", "a1.output.value")})
        .add_action("fan", "fan3", mapper={"value": Mapper("key", "a2.output.value")})
        .add_action("sink", "sink", mapper={"item": Mapper("key", "fan.output.item")})
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "fan")
        .add_dep("fan", "success", "sink")
    )
    workers = {
        "echo": Worker(handler=echo, output_schema="value string"),
        "fan3": Worker(handler=fan3, output_schema="item string"),
    }
    return cat, workers


def _bench_flow_dag(spark) -> dict:
    """Messages/sec through the generic DAG interpreter with natively
    VECTORIZED workers (the hot-path Worker contract — pandas batch in/out;
    row_worker's per-record loop is the parity fixture, not the fast path).
    The reference's one-goroutine-per-message interpreter pays ≥2 broker
    hops + ≥3 Mongo round-trips per DAG hop; this is the batched columnar
    equivalent of the same topology."""
    from spider_go_spark.plans.flow import FlowRuntime

    cat, workers = _flow_bench_setup()
    trig = spark.range(FLOW_TRIGGERS).selectExpr(
        "concat('t', id) AS task_id", "concat('v', id) AS value"
    )
    rt = FlowRuntime(spark, cat, workers)
    t0 = time.time()
    res = rt.trigger("a1", "triggered", trig)
    n_sink = 0
    for df in res.delivered["sink"]:
        n_sink += df.count()
    wall = time.time() - t0
    n_delivered = sum(
        df.count() for dfs in res.delivered.values() for df in dfs
    )
    return {
        "triggers": FLOW_TRIGGERS,
        "hops": res.hops,
        "n_sink_deliveries": n_sink,
        "n_messages_delivered": n_delivered,
        "wall_sec": round(wall, 3),
        "messages_per_sec": round(n_delivered / wall, 1),
    }


# Streaming flow-DAG sustained load: a pre-landed trigger backlog drained
# through the continuous interpreter in capped micro-batches, with a
# stop/restart mid-stream on the same checkpoint. The sink-row count must
# come out EXACT (batch-id overwrite idempotence), and the sustained rate
# includes all checkpoint/file-listing overhead.
FLOW_STREAM_TRIGGERS = 120_000
FLOW_STREAM_FILES = 24
FLOW_STREAM_FILES_PER_BATCH = 4


def _bench_flow_stream(spark) -> dict:
    from spider_go_spark.streaming.flowstream import flow_stream_query, read_flow_sink

    cat, workers = _flow_bench_setup()
    base = tempfile.mkdtemp(prefix="bench-flowstream-")
    trig_dir = os.path.join(base, "triggers")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    per_file = FLOW_STREAM_TRIGGERS // FLOW_STREAM_FILES
    expected_sink = FLOW_STREAM_TRIGGERS * 3

    def sink_rows() -> int:
        try:
            return read_flow_sink(spark, out_dir, "sink").count()
        except Exception:
            return 0  # sink dir not created yet / batch dir mid-write

    try:
        for i in range(FLOW_STREAM_FILES):
            spark.range(i * per_file, (i + 1) * per_file).selectExpr(
                "concat('t', id) AS task_id", "concat('v', id) AS value"
            ).coalesce(1).write.mode("append").parquet(trig_dir)

        def start():
            return flow_stream_query(
                spark, cat, workers, "a1", "triggered", trig_dir,
                "task_id string, value string", out_dir, ckpt,
                sink_keys=["sink"],
                max_files_per_trigger=FLOW_STREAM_FILES_PER_BATCH,
            )

        t0 = time.time()
        q = start()
        deadline = time.time() + 600
        rows_at_stop = 0
        while time.time() < deadline:
            rows_at_stop = sink_rows()
            if rows_at_stop >= expected_sink // 2:
                break
            time.sleep(0.3)
        q.stop()  # mid-stream kill; checkpoint holds committed progress
        q2 = start()
        while time.time() < deadline and sink_rows() < expected_sink:
            time.sleep(0.5)
        q2.stop()
        wall = time.time() - t0
        final_rows = sink_rows()
        n_batches = len(
            [d for d in os.listdir(os.path.join(out_dir, "sink"))
             if d.startswith("batch=")]
        )
        return {
            "triggers": FLOW_STREAM_TRIGGERS,
            "trigger_files": FLOW_STREAM_FILES,
            "micro_batches": n_batches,
            "sink_rows": final_rows,
            "sink_rows_expected": expected_sink,
            "exactly_once": final_rows == expected_sink,
            "rows_at_restart": rows_at_stop,
            "restarted_mid_stream": rows_at_stop < expected_sink,
            "wall_sec": round(wall, 3),
            "triggers_per_sec": round(FLOW_STREAM_TRIGGERS / wall, 1),
            "sink_msgs_per_sec": round(final_rows / wall, 1),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _pin_self() -> None:
    """Re-exec under taskset so the whole bench (JVM + Python workers) is
    pinned to exactly the advertised core count — stray host load can't
    donate cores to one round and starve the next (the r2 bench drifted
    −21% with no way to tell noise from regression)."""
    if os.environ.get("_SPARK_GRAFT_BENCH_PINNED") == "1":
        return
    if shutil.which("taskset") is None:
        return
    env = dict(os.environ)
    env["_SPARK_GRAFT_BENCH_PINNED"] = "1"
    os.execvpe(
        "taskset", ["taskset", "-c", f"0-{CPUS - 1}", sys.executable, *sys.argv], env
    )


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _merge_phases(into: dict, phase_sec: dict) -> None:
    for k, v in (phase_sec or {}).items():
        into[k] = round(into.get(k, 0.0) + v, 3)


def _bench_full_crawl(spark) -> dict:
    """Best-of-N 3-round crawls, each on a fresh workdir; per-phase
    breakdown taken from the best rep's round commits."""
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    walls, reps_meta = [], []
    best = None
    for _rep in range(CRAWL_REPS):
        workdir = tempfile.mkdtemp(prefix="bench-crawl-")
        try:
            cfg = CrawlConfig(
                workdir=workdir, n_urls=CRAWL_N_URLS, n_hosts=CRAWL_N_HOSTS,
                num_shards=CRAWL_SHARDS, max_rounds=CRAWL_ROUNDS,
                default_budget=CRAWL_BUDGET,
            )
            eng = CrawlEngine(spark, cfg)
            t0 = time.time()
            history = eng.crawl(
                seeds=make_seeds(spark, CRAWL_SEEDS, CRAWL_N_URLS, CRAWL_N_HOSTS)
            )
            wall = time.time() - t0
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        walls.append(round(wall, 3))
        phases: dict[str, float] = {}
        for h in history:
            _merge_phases(phases, h.get("phase_sec"))
        n_fetched = sum(h.get("n_fetched", 0) for h in history)
        n_deduped = sum(h.get("n_candidates", 0) for h in history)
        meta = {
            "wall_sec": round(wall, 3), "phase_sec": phases,
            "n_fetched": n_fetched, "n_deduped": n_deduped,
        }
        reps_meta.append(meta)
        if best is None or wall < best["wall_sec"]:
            best = meta
    return {
        "n_urls_fetched": best["n_fetched"],
        "n_candidates_deduped": best["n_deduped"],
        "rounds": CRAWL_ROUNDS,
        "wall_sec": best["wall_sec"],
        "walls_sec": walls,
        "reps": CRAWL_REPS,
        "phase_sec": best["phase_sec"],
        "urls_fetched_per_sec": round(best["n_fetched"] / best["wall_sec"], 2),
        "candidates_deduped_per_sec": round(best["n_deduped"] / best["wall_sec"], 2),
    }


def _bench_steady_round(spark, seen_filter: str = "bloom", reps: int | None = None) -> dict:
    """Prepare a 300k-row frontier once, then best-of-N single fetch
    rounds, each on a fresh copy of the prepared workdir (identical
    input per rep). ``seen_filter`` selects the seen-set arm (bloom or
    cuckoo) — the workdir is prepared under the SAME arm (the checkpoint
    config fingerprint includes it). A digest of the round's fetched docs
    is recorded so the two arms' outputs can be asserted identical."""
    import hashlib

    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    reps = CRAWL_REPS if reps is None else reps
    base = tempfile.mkdtemp(prefix="bench-steady-")
    src = os.path.join(base, "src")
    try:
        def cfg_for(wd: str) -> "CrawlConfig":
            return CrawlConfig(
                workdir=wd, n_urls=STEADY_N_URLS, n_hosts=STEADY_N_HOSTS,
                num_shards=STEADY_SHARDS, max_rounds=2, default_budget=STEADY_BUDGET,
                seen_filter=seen_filter,
            )

        CrawlEngine(spark, cfg_for(src)).inject_seeds(
            make_seeds(spark, STEADY_SEEDS, STEADY_N_URLS, STEADY_N_HOSTS)
        )
        walls, best, digest = [], None, None
        for rep in range(reps):
            wd = os.path.join(base, f"run-{rep}")
            shutil.copytree(src, wd)
            eng = CrawlEngine(spark, cfg_for(wd))
            t0 = time.time()
            m = eng.run_round(1)
            wall = time.time() - t0
            if digest is None:
                rows = sorted(
                    (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
                    for r in eng.fetched_docs.read().collect()
                )
                digest = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
            shutil.rmtree(wd, ignore_errors=True)
            walls.append(round(wall, 3))
            meta = {
                "wall_sec": round(wall, 3),
                "phase_sec": dict(m.get("phase_sec") or {}),
                "n_fetched": m["n_fetched"], "n_candidates": m["n_candidates"],
            }
            if best is None or wall < best["wall_sec"]:
                best = meta
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return {
        "seen_filter": seen_filter,
        "n_urls_fetched": best["n_fetched"],
        "n_candidates_deduped": best["n_candidates"],
        "wall_sec": best["wall_sec"],
        "walls_sec": walls,
        "reps": reps,
        "phase_sec": best["phase_sec"],
        "urls_fetched_per_sec": round(best["n_fetched"] / best["wall_sec"], 2),
        "fetched_digest": digest,
    }


def _bench_tiered_scheduling(spark) -> dict:
    """Frontier ≫ round size, at TWO frontier sizes: per-round scheduling
    cost untiered (scans the whole frontier) vs hot/cold tiered (scans the
    hot tier). The asymptotics are the evidence: doubling the frontier
    grows the untiered schedule_rank cost but leaves the tiered one flat
    (bounded by hosts × hot_tier_rounds × budget). Assignments are
    bit-identical between modes by construction (test_tiering)."""
    from spider_go_spark import schemas
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    # a real (small) policy so scheduling pays the robots/policy pass the
    # 10^10 design point pays — that is exactly the O(frontier) cost tiering
    # bounds; policy hosts use the same budget as the default
    policy = spark.createDataFrame(
        [(f"h{i}.example.test", 0, TIER_BUDGET, None, False, None) for i in range(64)],
        schemas.HOST_POLICY,
    )

    def cfg_for(wd: str, tiered: bool) -> "CrawlConfig":
        return CrawlConfig(
            workdir=wd, n_urls=TIER_N_URLS, n_hosts=TIER_N_HOSTS,
            num_shards=STEADY_SHARDS, max_rounds=TIER_ROUNDS + 1,
            default_budget=TIER_BUDGET,
            hot_tier_rounds=TIER_R if tiered else 0,
        )

    sizes_out = []
    for seeds in TIER_SEED_SIZES:
        base = tempfile.mkdtemp(prefix="bench-tier-")
        src = os.path.join(base, "src")
        try:
            CrawlEngine(spark, cfg_for(src, False)).inject_seeds(
                make_seeds(spark, seeds, TIER_N_URLS, TIER_N_HOSTS)
            )
            out: dict[str, dict] = {}
            for mode, tiered in (("untiered", False), ("tiered", True)):
                wd = os.path.join(base, mode)
                shutil.copytree(src, wd)
                eng = CrawlEngine(spark, cfg_for(wd, tiered), host_policy=policy)
                sched, reb, fetched = [], 0.0, 0
                for rnd in range(1, TIER_ROUNDS + 1):
                    m = eng.run_round(rnd)
                    ph = m.get("phase_sec") or {}
                    sched.append(round(ph.get("schedule_rank", 0.0), 3))
                    reb += ph.get("tier_rebalance", 0.0)
                    fetched += m.get("n_fetched", 0)
                # steady rounds only (round 1 absorbs warm-up + rebalance)
                steady = sched[1:]
                out[mode] = {
                    "schedule_rank_sec_per_round": sched,
                    "sched_sec_steady_avg": round(sum(steady) / len(steady), 3),
                    "rebalance_sec_total": round(reb, 3),
                    "n_fetched_total": fetched,
                }
                shutil.rmtree(wd, ignore_errors=True)
            sizes_out.append(
                {
                    "frontier_rows": seeds,
                    "untiered": out["untiered"],
                    "tiered": out["tiered"],
                    "sched_speedup_steady": round(
                        out["untiered"]["sched_sec_steady_avg"]
                        / max(out["tiered"]["sched_sec_steady_avg"], 1e-9),
                        2,
                    ),
                }
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    growth = lambda mode: round(
        sizes_out[-1][mode]["sched_sec_steady_avg"]
        / max(sizes_out[0][mode]["sched_sec_steady_avg"], 1e-9),
        2,
    )
    return {
        "round_fetches": TIER_N_HOSTS * TIER_BUDGET,
        "hot_tier_rounds": TIER_R,
        "sizes": sizes_out,
        # frontier 2×: untiered sched should grow ~2×, tiered ~1×
        "untiered_sched_growth": growth("untiered"),
        "tiered_sched_growth": growth("tiered"),
    }


def main() -> None:
    _pin_self()
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

    crawl = _bench_full_crawl(spark)
    times["crawl_3_rounds"] = crawl["wall_sec"]
    steady = _bench_steady_round(spark)
    times["crawl_steady_round"] = steady["wall_sec"]
    # cuckoo seen-set arm at the same scale: throughput + digest equality
    # vs the Bloom arm (2 reps — the evidence is the arm, not the spread)
    steady_cuckoo = _bench_steady_round(spark, seen_filter="cuckoo", reps=2)
    times["crawl_steady_round_cuckoo"] = steady_cuckoo["wall_sec"]
    steady_cuckoo["digest_equals_bloom"] = (
        steady_cuckoo["fetched_digest"] == steady["fetched_digest"]
    )
    tiered = _bench_tiered_scheduling(spark)
    flow = _bench_flow_dag(spark)
    times["flow_dag_interpret"] = flow["wall_sec"]
    flow_stream = _bench_flow_stream(spark)
    times["flow_dag_stream"] = flow_stream["wall_sec"]

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_ops_plus_crawl_rounds_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pinned_cpus": CPUS,
        "crawl_reps": CRAWL_REPS,
        "crawl": crawl,
        "crawl_steady_round": steady,
        "crawl_steady_round_cuckoo": steady_cuckoo,
        "tiered_scheduling": tiered,
        "flow_dag": flow,
        "flow_dag_stream": flow_stream,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
