"""The crawl engine: batched fetch-parse-enqueue rounds as DataFrame
micro-iterations.

One round ≙ one full message hop through the reference's DAG (SURVEY.md §3.1
— trigger/output consume → action lookup → disabled filter → fan-out →
worker handler → output), collapsed into a single declarative plan:

    read frontier snapshot
    → broadcast join host_policy; disabled + robots filters   [politeness]
    → salted window-ranked budget cut                          [politeness]
    → deterministic global fetch order                         [global_rank]
    → mapInPandas fetch+parse (Arrow batches)                  [fetch]
    → link extraction from spans (built-in array fns)          [explode]
    → canonicalize + hash + in-round dedup                     [URL kernel]
    → Bloom-prefiltered exact anti-join vs seen set            [seen]
    → append fetched_docs + lineage; enqueue next frontier;
      OR new Bloom bits into seen shards; commit round_state   [checkpoint]

Dedup semantics match the reference: a URL enters the seen set when it is
ENQUEUED (≙ Mongo unique-index-on-insert,
/root/reference/pkg/spider/storage_workflow_mongodb.go:81-119), not when
fetched — so the frontier never contains duplicates and a URL is fetched at
most once, ever.

Scale notes (10^10 frontier):
- the frontier rewrite each round removes only assigned rows via a
  broadcast anti-join (assignments ≤ Σ per-host budgets ≪ frontier);
- candidates shuffle once on shard_id for the seen probe (uniform by hash,
  immune to host skew); the politeness window is the only host-keyed
  shuffle and it is salted;
- nothing ever collects to the driver except per-partition counts and
  snapshot metadata.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark import schemas
from spider_go_spark.functions.urls import canonicalize_udf, host_hash_col, host_udf, url_hash_col
from spider_go_spark.operators.politeness import (
    DEFAULT_BUDGET,
    DEFAULT_ROUND_BUDGET_MS,
    DEFAULT_SALT_N,
    frontier_order,
    schedule_round,
)
from spider_go_spark.operators.ranking import global_rank
from spider_go_spark.operators.seen import (
    bloom_params,
    build_shard_updates,
    filter_unseen,
    merge_shards,
)
from spider_go_spark.plans.checkpoint import RoundStateLog
from spider_go_spark.sources.webgraph import synthetic_fetch
from spider_go_spark.tables.snapshot import Catalog, SnapshotTable

# discovery_rank = parent_fetch_rank * LINK_STRIDE + link_position: a strict
# FIFO discovery order (parents in fetch order, links in span order), valid
# while pages emit < LINK_STRIDE links.
LINK_STRIDE = 4096


@dataclass
class CrawlConfig:
    workdir: str
    n_urls: int = 10_000
    n_hosts: int = 20
    num_shards: int = 16
    expected_urls: int = 0  # bloom sizing; defaults to n_urls
    default_budget: int = DEFAULT_BUDGET
    round_budget_ms: int = DEFAULT_ROUND_BUDGET_MS
    salt_n: int = DEFAULT_SALT_N
    max_rounds: int = 10
    config_version: int = 1
    keep_snapshots: int = 1_000_000  # retention; tests keep everything

    def __post_init__(self):
        if not self.expected_urls:
            self.expected_urls = self.n_urls

    def fingerprint(self) -> str:
        """Semantic-config fingerprint committed with every round_state:
        resuming under a config that changes crawl semantics or Bloom
        geometry must fail loudly, not silently diverge (the reference's
        flow Version increment serves the same invalidation role,
        storage_workflow_mongodb.go:701-715)."""
        parts = (
            self.n_urls, self.n_hosts, self.num_shards, self.expected_urls,
            self.default_budget, self.round_budget_ms, self.salt_n,
        )
        return "-".join(str(p) for p in parts)


class CrawlEngine:
    def __init__(self, spark: SparkSession, config: CrawlConfig, host_policy: DataFrame | None = None):
        self.spark = spark
        self.cfg = config
        self.catalog = Catalog(spark, config.workdir)
        self.frontier = self.catalog.load("frontier", schemas.FRONTIER)
        self.seen_shards = self.catalog.load("seen_shards", schemas.SEEN_SHARDS)
        self.seen_urls = self.catalog.load("seen_urls", schemas.SEEN_URLS)
        self.fetched_docs = self.catalog.load("fetched_docs", schemas.FETCHED_DOCS)
        self.lineage = self.catalog.load("lineage", schemas.LINEAGE)
        self.fetch_metrics = self.catalog.load("fetch_metrics", schemas.ROUND_METRICS)
        self.state_log = RoundStateLog(config.workdir)
        self.m_bits, self.k_hashes = bloom_params(config.expected_urls, config.num_shards)
        if host_policy is None:
            host_policy = spark.createDataFrame([], schemas.HOST_POLICY)
        self.host_policy = host_policy
        # memoized once: the policy plan is fixed at engine construction, so
        # re-running the isEmpty() job every scheduling round would recompute
        # the same answer (one extra Spark job per round for nothing)
        self._policy_empty = host_policy.isEmpty()

    def _commit_state(self, rnd: int, metrics: dict) -> None:
        """Atomic round commit + retention sweep (keep_snapshots manifests
        per table — ≙ the reference's 1 h stream retention, nats.go:149-158,
        made explicit and durable)."""
        self.state_log.commit(
            rnd,
            self._snapshot_ids(),
            self.cfg.config_version,
            metrics,
            config_fingerprint=self.cfg.fingerprint(),
        )
        for table in self._tables().values():
            table.expire_snapshots(keep_last=self.cfg.keep_snapshots)

    # -- helpers ---------------------------------------------------------------
    def _tables(self) -> dict[str, SnapshotTable]:
        return {
            "frontier": self.frontier,
            "seen_shards": self.seen_shards,
            "seen_urls": self.seen_urls,
            "fetched_docs": self.fetched_docs,
            "lineage": self.lineage,
            "fetch_metrics": self.fetch_metrics,
        }

    def _snapshot_ids(self) -> dict[str, int]:
        return {name: t.current_snapshot_id() for name, t in self._tables().items()}

    def _candidates_from_raw(self, raw: DataFrame, rnd: int) -> DataFrame:
        """raw(url, priority, parent_hash, depth, discovery_rank) →
        canonicalized, hashed, in-batch-deduped frontier candidates."""
        c = raw.withColumn("url_norm", canonicalize_udf(F.col("url"))).filter(
            F.col("url_norm").isNotNull()
        )
        c = (
            c.withColumn("url_hash", url_hash_col("url_norm"))
            .withColumn("host", host_udf(F.col("url_norm")))
            .withColumn("host_hash", host_hash_col("host"))
            .withColumn("discovered_round", F.lit(rnd).cast("int"))
        )
        # in-batch dedup: keep the FIRST discovery (min priority-order key) —
        # deterministic, matches the oracle's first-wins insert semantics
        key = F.struct(
            (-F.col("priority")).alias("np"),
            F.col("discovery_rank").alias("dr"),
            F.col("priority").alias("priority"),
            F.col("depth").alias("depth"),
            F.col("parent_hash").alias("parent_hash"),
            F.col("url").alias("url"),
        )
        c = (
            c.groupBy("url_norm", "url_hash", "host", "host_hash", "discovered_round")
            .agg(F.min(key).alias("k"))
            .select(
                F.col("k.url").alias("url"),
                "url_norm",
                "url_hash",
                "host",
                "host_hash",
                F.col("k.depth").alias("depth"),
                F.col("k.priority").alias("priority"),
                F.col("k.parent_hash").alias("parent_hash"),
                "discovered_round",
                F.col("k.dr").alias("discovery_rank"),
            )
        )
        return c

    def _enqueue(
        self, candidates: DataFrame, rnd: int, label: str, base_frontier: DataFrame | None = None
    ) -> tuple[int, int]:
        """Filter candidates vs seen set, append to frontier + seen + lineage.
        ``base_frontier`` is the carried-over frontier (defaults to the
        current snapshot) — passed in by run_round so the round does ONE
        frontier rewrite, not two. Returns (n_new, n_candidates)."""
        candidates = candidates.persist()
        n_cand = candidates.count()
        shards = self.seen_shards.read()
        seen = self.seen_urls.read()
        # filter_unseen returns persisted+materialized; projections below
        # read the cache, and we unpersist it at the end of the commit
        unseen = filter_unseen(candidates, shards, seen, self.cfg.num_shards)
        new = unseen.select(*[f.name for f in schemas.FRONTIER.fields], "shard_id")
        n_new = unseen.count()

        frontier_new = new.select(*[f.name for f in schemas.FRONTIER.fields])
        prev = base_frontier if base_frontier is not None else self.frontier.read()
        self.frontier.overwrite(prev.unionByName(frontier_new), f"round-{rnd:06d}")

        self.seen_urls.append(
            new.select(
                "url_hash", "url_norm", "shard_id", F.lit(rnd).cast("int").alias("seen_round")
            ),
            f"round-{rnd:06d}",
        )
        updates = build_shard_updates(
            new.select("url_norm", "url_hash"), self.cfg.num_shards, self.m_bits, self.k_hashes
        )
        merged = merge_shards(shards, updates)
        self.seen_shards.overwrite(merged, f"round-{rnd:06d}")

        self.lineage.append(
            new.select(
                "url_hash",
                "url_norm",
                "parent_hash",
                F.lit(rnd).cast("int").alias("round"),
                F.col("discovery_rank").alias("rank_in_round"),
                F.spark_partition_id().alias("partition_id"),
            ),
            f"{label}-{rnd:06d}",
        )
        unseen.unpersist()
        candidates.unpersist()
        return n_new, n_cand

    # -- round 0: seed injection ------------------------------------------------
    def inject_seeds(self, seeds: DataFrame) -> dict:
        """≙ trigger message → new session (workflow.go:83-127): seeds become
        round-0 frontier entries; the seen set starts as the seed set."""
        # seed discovery_rank is uniformly 0: the scheduler order falls back
        # to (priority desc, url_norm), which is deterministic without any
        # notion of "seed file position" (Spark reads are unordered)
        raw = seeds.select(
            "url",
            "priority",
            F.lit(None).cast("long").alias("parent_hash"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("long").alias("discovery_rank"),
        )
        n_new, n_cand = self._enqueue(self._candidates_from_raw(raw, 0), 0, "seeds")
        metrics = {"n_candidates": n_cand, "n_new": n_new, "n_fetched": 0}
        self._commit_state(0, metrics)
        return metrics

    def add_seeds(self, seeds: DataFrame) -> dict:
        """Mid-crawl external seed submission (≙ webhook trigger,
        /root/reference/cmd/webhook-trigger/main.go:32-70: an HTTP POST can
        start new work in a live system at any time).

        Modeled as its own committed round so exactly-once resume semantics
        are preserved: the ingestion consumes a round number and commits
        round_state like any fetch round; a crash before the commit re-runs
        the ingestion idempotently (already-seen URLs dedup away)."""
        last = self.state_log.last_round()
        rnd = 0 if last is None else last + 1
        raw = seeds.select(
            "url",
            "priority",
            F.lit(None).cast("long").alias("parent_hash"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("long").alias("discovery_rank"),
        )
        n_new, n_cand = self._enqueue(self._candidates_from_raw(raw, rnd), rnd, "seeds")
        metrics = {"n_candidates": n_cand, "n_new": n_new, "n_fetched": 0, "seed_ingestion": 1}
        self._commit_state(rnd, metrics)
        return metrics

    def ingest_staged(self, staged_dir: str) -> dict:
        """Drain the streaming seed-ingestion staging area
        (spider_go_spark.streaming.pipeline.seed_ingestion_query) into the
        frontier at a round boundary."""
        from pyspark.errors import AnalysisException

        try:
            staged = self.spark.read.parquet(staged_dir)
        except AnalysisException:
            # nothing staged yet (the streaming query has not committed any
            # batch): a graceful no-op, not a crashed crawl driver
            return {"n_candidates": 0, "n_new": 0, "n_fetched": 0, "seed_ingestion": 1}
        return self.add_seeds(
            staged.select(F.col("url_norm").alias("url"), "priority")
        )

    # -- one crawl round ---------------------------------------------------------
    def run_round(self, rnd: int) -> dict:
        frontier = self.frontier.read()
        assignments = schedule_round(
            frontier,
            self.host_policy,
            default_budget=self.cfg.default_budget,
            round_budget_ms=self.cfg.round_budget_ms,
            salt_n=self.cfg.salt_n,
            policy_empty=self._policy_empty,
        )
        # global_rank returns its result persisted+materialized (it must pin
        # the sampled range boundaries); derive lazily from that one cache
        ranked = global_rank(assignments, frontier_order(), rank_col="fetch_rank")
        assignments = ranked.withColumn("round", F.lit(rnd).cast("int"))
        n_assigned = ranked.count()
        if n_assigned == 0:
            ranked.unpersist()
            metrics = {"n_assigned": 0, "n_fetched": 0, "n_ok": 0, "n_candidates": 0, "n_new": 0}
            self._commit_state(rnd, metrics)
            return metrics

        # AQE coalesces by *bytes*, which under-parallelizes the CPU-heavy
        # Arrow fetch stage (URL rows are tiny, fetch work per row is not):
        # spread assignments across all cores explicitly before mapInPandas
        par = self.spark.sparkContext.defaultParallelism
        fetch_input = assignments.repartition(par, "url_hash")
        fetched = synthetic_fetch(fetch_input, self.cfg.n_urls, self.cfg.n_hosts).persist()
        self.fetched_docs.append(fetched, f"round-{rnd:06d}")

        # per-partition fetch metrics (north rule): one row per task of the
        # fetch stage — observability into skew without any extra shuffle
        # beyond the tiny metric agg itself
        metrics_rows = fetched.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count(F.lit(1)).alias("n_fetched"),
            F.count(F.when(F.col("status") == "200", 1)).alias("n_ok"),
            F.sum(F.size("out_links")).cast("long").alias("n_links_out"),
        ).select(
            F.lit(rnd).cast("int").alias("round"),
            "partition_id",
            "n_fetched",
            "n_ok",
            "n_links_out",
        )
        self.fetch_metrics.append(metrics_rows, f"round-{rnd:06d}")

        # link extraction from the interleaved spans — built-in array fns,
        # JVM-side (≙ dep fan-out loop workflow.go:140-191 / explode(links))
        links = fetched.select(
            F.col("url_hash").alias("parent_hash"),
            F.col("fetch_rank"),
            F.posexplode(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == F.lit("link")),
                    lambda s: s["text"],
                )
            ).alias("pos", "url"),
            F.col("round"),
        )
        parent_prio = assignments.select(
            F.col("url_hash").alias("parent_hash"),
            F.col("priority").alias("parent_priority"),
            F.col("depth").alias("parent_depth"),
        )
        raw = links.join(parent_prio, "parent_hash").select(
            "url",
            F.col("parent_priority").alias("priority"),
            "parent_hash",
            (F.col("parent_depth") + 1).alias("depth"),
            (F.col("fetch_rank") * LINK_STRIDE + F.col("pos")).alias("discovery_rank"),
        )
        candidates = self._candidates_from_raw(raw, rnd + 1)

        # remove assigned rows from the frontier (broadcast anti-join: the
        # assignment set is budget-bounded and small relative to the frontier);
        # committed together with the newly-enqueued candidates in ONE
        # frontier rewrite inside _enqueue
        remaining = frontier.join(
            F.broadcast(assignments.select("url_norm")), "url_norm", "left_anti"
        )

        n_new, n_cand = self._enqueue(candidates, rnd + 1, "links", base_frontier=remaining)
        # n_fetched = every fetch attempt (matches the fetch_metrics table);
        # n_ok = 200s only (previously misnamed n_fetched)
        n_ok = fetched.filter(F.col("status") == "200").count()
        metrics = {
            "n_assigned": n_assigned,
            "n_fetched": n_assigned,
            "n_ok": n_ok,
            "n_candidates": n_cand,
            "n_new": n_new,
        }
        self._commit_state(rnd, metrics)
        ranked.unpersist()
        fetched.unpersist()
        return metrics

    # -- full crawl / resume ------------------------------------------------------
    def crawl(self, seeds: DataFrame | None = None, max_rounds: int | None = None) -> list[dict]:
        """Run (or resume) the crawl to completion. If a committed round_state
        exists, resumes from it (bit-identically); else requires ``seeds``."""
        max_rounds = max_rounds or self.cfg.max_rounds
        state = self.state_log.restore(self._tables())
        if state is not None:
            committed = state.get("config_fingerprint")
            if committed is not None and committed != self.cfg.fingerprint():
                raise ValueError(
                    "refusing to resume: CrawlConfig changed since the checkpoint "
                    f"(committed {committed!r} != current {self.cfg.fingerprint()!r}); "
                    "a changed config silently breaks bit-identical resume "
                    "(and a changed Bloom geometry corrupts shard merges)"
                )
        history: list[dict] = []
        if state is None:
            if seeds is None:
                raise ValueError("no checkpoint to resume and no seeds given")
            history.append(self.inject_seeds(seeds))
            next_round = 1
        else:
            next_round = state["round"] + 1
        for rnd in range(next_round, max_rounds + 1):
            m = self.run_round(rnd)
            history.append(m)
            if m.get("n_assigned", 1) == 0:  # frontier exhausted — terminate
                break
        return history
