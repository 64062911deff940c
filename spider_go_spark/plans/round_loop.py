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
- frontier maintenance is PARTITION-SCOPED: the frontier table is
  hash-bucketed by pmod(url_hash, frontier_buckets) and each round rewrites
  ONLY the buckets containing assigned or newly-enqueued rows (an
  Iceberg-style overwrite-by-partition-filter commit). A round touching
  10^7 of 10^10 rows reads+writes the touched buckets, never the ~2 TB
  whole table; assigned-row removal is a bucket-pruned anti-join on
  (url_hash, url_norm) with no broadcast hint — AQE picks the strategy;
- candidates shuffle once on shard_id for the seen probe (uniform by hash,
  immune to host skew); the politeness window is the only host-keyed
  shuffle and it is salted;
- nothing ever collects to the driver except per-partition counts,
  touched-bucket ids (≤ frontier_buckets ints), and snapshot metadata.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Callable

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
from spider_go_spark.operators import cuckoo
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


@contextmanager
def _timed(phases: dict[str, float], name: str):
    """Accumulate wall seconds of a round phase into ``phases`` — the
    per-round analogue of the per-partition fetch metrics: every round's
    commit records where its wall time went (schedule, fetch, seen probe,
    frontier rewrite, commits), so a throughput regression is attributable
    from the round_state log alone."""
    t0 = time.time()
    try:
        yield
    finally:
        phases[name] = round(phases.get(name, 0.0) + time.time() - t0, 3)


@dataclass
class CrawlConfig:
    workdir: str
    # tenant id: every engine-table row is scoped to a crawl_id (≙ the
    # reference's per-workflow scoping, storage_workflow_mongodb.go:213-222);
    # multiple crawls share one catalog, interleaving at round granularity.
    # NOT part of the semantic fingerprint — each crawl validates against
    # its own committed entries.
    crawl_id: str = "default"
    n_urls: int = 10_000
    n_hosts: int = 20
    num_shards: int = 16
    # frontier hash-bucket count (partition-scoped rewrites). At the 10^10
    # design point size so one bucket ≈ a few GB: e.g. 4096 buckets ≈ 2.4M
    # rows/bucket. Local tests keep it small so multiple buckets stay
    # untouched per round (the pruning is observable).
    frontier_buckets: int = 16
    expected_urls: int = 0  # bloom sizing; defaults to n_urls
    default_budget: int = DEFAULT_BUDGET
    round_budget_ms: int = DEFAULT_ROUND_BUDGET_MS
    salt_n: int = DEFAULT_SALT_N
    max_rounds: int = 10
    # crawl-depth cap (0 = unlimited): candidates deeper than this never
    # enter the frontier — the first-line crawler-trap guard (see also the
    # URL-shape trap filter, queries/crawlq.url_trap_filter)
    max_depth: int = 0
    # fetch retry-with-backoff: a non-200 fetch re-enters the scheduler via
    # the revisit queue after retry_backoff_rounds, until it has consumed
    # retry_max_attempts attempts. 1 = single attempt (no retry, default).
    retry_max_attempts: int = 1
    retry_backoff_rounds: int = 1
    # synthetic-fetcher failure injection: 1/N of nodes 503 on their first
    # attempt and succeed on retries (0 = off; see webgraph.status_of_nodes)
    transient_every: int = 0
    # adaptive revisit (change detection): when a revisit policy is active
    # and a refetch returns content identical to the last successful fetch
    # (content_hash unchanged), the URL's revisit interval doubles — up to
    # revisit_max_interval — and resets to the policy base the moment the
    # content changes. The classic freshness-driven recrawl schedule
    # (Cho & Garcia-Molina, "Synchronizing a database to improve freshness",
    # SIGMOD 2000), expressed as a pure passthrough comparison: the revisit
    # entry carries (last_hash, interval), so change detection costs no join
    # against the fetched-docs history.
    adaptive_revisit: bool = False
    revisit_max_interval: int = 16
    # synthetic content churn: half the nodes publish new content every
    # change_period rounds (0 = static; see webgraph.content_hash_of_nodes)
    change_period: int = 0
    # wall-clock cadence a round represents + the fixed time anchor for
    # round 0 — used ONLY to map cron-spec revisit schedules (host_policy
    # "cron" column) onto eligibility rounds; no wall clock is ever read,
    # so cron crawls stay deterministic and resume bit-identically
    round_period_s: int = 3600
    cron_epoch: str = "2024-01-01T00:00:00"
    # hot/cold frontier tiering (0 = off): per-round scheduling scans only
    # the HOT tier — each host's top (hot_tier_rounds × max budget) rows
    # under the scheduler order — instead of the whole frontier, and a
    # salted rebalance every hot_tier_rounds rounds re-splits the tiers.
    # Exactness: the hot prefix guards R rounds of cuts (see
    # politeness.tier_split), so assignments are bit-identical to the
    # untiered scheduler; what changes is per-round cost — O(hot tier)
    # instead of O(frontier), with the O(frontier) rebalance amortized
    # over R rounds. At the 10^10-frontier / 10^7-round design point this
    # is the difference between the scheduler shuffling ~2 TB per round
    # and shuffling the ~per-host-prefix hot set (bounded by
    # n_hosts × R × budget rows). Cold rows live in bucket ids offset by
    # frontier_buckets, so the hot scan is a physical partition prune.
    hot_tier_rounds: int = 0
    # per-host failure circuit breaker (0 = off): a host accumulating
    # breaker_threshold consecutive failed fetches (no 200 in between) is
    # quarantined — excluded from scheduling, its frontier rows untouched —
    # through round rnd + min(breaker_cooldown_rounds · 2^(trips−1),
    # breaker_max_cooldown); each consecutive trip doubles the cooldown and
    # any successful fetch fully resets streak and trip count. Streaks are
    # round-granular (deterministic without intra-round ordering): a round
    # with ≥1 success resets, a round with only failures adds them all.
    # The crawl-ops pattern for a host that is down or rate-limiting: stop
    # burning politeness budget on it, probe with exponential back-off.
    breaker_threshold: int = 0
    breaker_cooldown_rounds: int = 2
    breaker_max_cooldown: int = 16
    # synthetic-fetcher dead hosts: every fetch on these hosts returns 503
    # on every attempt (the deterministic stand-in for a downed host; see
    # webgraph.synthetic_fetch)
    dead_hosts: tuple = ()
    # crawler product token for robots.txt user-agent group selection
    # (RFC 9309): "*" applies only the wildcard groups (pre-agent behavior);
    # a named token selects that token's groups, falling back to "*" groups
    # when the file names no such agent.
    user_agent: str = "*"
    # sitemap autodiscovery (RFC 9309 §2.3 / sitemaps.org): when enabled,
    # every ``Sitemap:`` URL in the policy table's robots bodies is injected
    # as a round-0 seed at sitemap_seed_priority (the mid-crawl counterpart
    # — policies changing later — goes through add_seeds like any webhook)
    ingest_robots_sitemaps: bool = False
    sitemap_seed_priority: float = 0.0
    # approximate seen-set pre-filter: "bloom" (default; OR-mergeable
    # bitmaps) or "cuckoo" (4-slot 16-bit-fingerprint tables — ~80× lower
    # FP rate and O(1) per-item DELETION, so forget_urls retracts
    # fingerprints instead of rebuilding shards). Both compose with the
    # same exact-verify anti-join, so crawl SEMANTICS are identical.
    seen_filter: str = "bloom"
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
            self.frontier_buckets, self.max_depth, self.retry_max_attempts,
            self.retry_backoff_rounds, self.transient_every,
            self.adaptive_revisit, self.revisit_max_interval,
            self.change_period,
        )
        if self.hot_tier_rounds:
            # appended only when tiering is on: toggling tiers mid-crawl
            # would strand assigned-row removal (cold bucket ids are not in
            # the untiered bucket transform); appending conditionally keeps
            # pre-tiering checkpoints resumable under default configs
            parts += (self.hot_tier_rounds,)
        if (self.round_period_s, self.cron_epoch) != (3600, "2024-01-01T00:00:00"):
            # cron time mapping changes revisit semantics; appended only
            # when non-default for the same compat reason as above
            parts += (self.round_period_s, self.cron_epoch)
        if self.user_agent != "*":
            # agent-group selection changes which robots rules apply —
            # semantic; appended conditionally for the same compat reason
            parts += (self.user_agent,)
        if self.ingest_robots_sitemaps:
            # sitemap seeds change the round-0 frontier — semantic
            parts += ("sitemaps", self.sitemap_seed_priority)
        if self.seen_filter != "bloom":
            # the shard table schema/geometry is filter-specific: resuming
            # a bloom checkpoint with cuckoo shards would corrupt merges
            parts += (self.seen_filter,)
        if self.breaker_threshold or self.dead_hosts:
            # quarantine changes which hosts schedule (semantic); dead
            # hosts change fetch outcomes; appended conditionally to keep
            # pre-breaker checkpoints resumable under default configs
            parts += (
                self.breaker_threshold, self.breaker_cooldown_rounds,
                self.breaker_max_cooldown, tuple(self.dead_hosts),
            )
        return "-".join(str(p) for p in parts)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        host_policy: DataFrame | None = None,
        docs_sink: Callable[[int, DataFrame], None] | None = None,
    ):
        """``docs_sink(round, docs_df)`` — pluggable external side-effect
        sink for each round's fetched documents (≙ the reference's
        slack-worker, /root/reference/cmd/slack-worker/main.go:31-84: a
        worker whose only job is pushing results to an external system).
        Called AFTER the round commits; an ack file records delivery, so a
        crash between commit and sink replays the sink on resume — per-round
        at-least-once with the round number as the idempotence key (true
        exactly-once is impossible for external side effects; this matches
        foreachBatch's contract)."""
        self.spark = spark
        self.cfg = config
        self.docs_sink = docs_sink
        self.catalog = Catalog(spark, config.workdir)
        # the frontier bucket count is a CATALOG property, not a per-crawl
        # one: tenants sharing the catalog must agree on the bucket
        # transform or partition-scoped rewrites would scatter each other's
        # rows across mappings
        self._pin_catalog_property("frontier_buckets", config.frontier_buckets)
        # table schemas are the base schemas + the crawl_id tenant column;
        # operators stay crawl-agnostic (the engine filters reads / stamps
        # writes)
        self.frontier = self.catalog.load("frontier", schemas.with_crawl_id(schemas.FRONTIER))
        if config.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown seen_filter {config.seen_filter!r}")
        _shard_schema = (
            schemas.SEEN_SHARDS if config.seen_filter == "bloom" else cuckoo.CUCKOO_SHARDS
        )
        self.seen_shards = self.catalog.load("seen_shards", schemas.with_crawl_id(_shard_schema))
        self.seen_urls = self.catalog.load("seen_urls", schemas.with_crawl_id(schemas.SEEN_URLS))
        self.fetched_docs = self.catalog.load("fetched_docs", schemas.with_crawl_id(schemas.FETCHED_DOCS))
        self.lineage = self.catalog.load("lineage", schemas.with_crawl_id(schemas.LINEAGE))
        self.fetch_metrics = self.catalog.load("fetch_metrics", schemas.with_crawl_id(schemas.ROUND_METRICS))
        self.revisit = self.catalog.load("revisit", schemas.with_crawl_id(schemas.REVISIT))
        self.breaker = self.catalog.load("breaker", schemas.with_crawl_id(schemas.BREAKER))
        self.state_log = RoundStateLog(config.workdir)
        self.m_bits, self.k_hashes = bloom_params(config.expected_urls, config.num_shards)
        self.cuckoo_buckets = cuckoo.cuckoo_params(config.expected_urls, config.num_shards)
        if host_policy is None:
            host_policy = spark.createDataFrame([], schemas.HOST_POLICY)
        self.host_policy = host_policy
        # memoized once: the policy plan is fixed until update_policy(), so
        # re-running these jobs every scheduling round would recompute the
        # same answers (extra Spark jobs per round for nothing)
        self._memoize_policy()

    def _memoize_policy(self) -> None:
        self._policy_empty = self.host_policy.isEmpty()
        # cron-spec revisit schedules (≙ the reference's gocron specs,
        # cmd/cron-trigger/main.go:149): hosts with a "cron" policy column
        # get their revisit gap recomputed each round from the spec and the
        # round↔wall-time mapping. Collected once (the policy is a tiny
        # dim); specs are validated loudly here, not mid-crawl.
        self._cron_hosts: dict[str, str] = {}
        if not self._policy_empty and "cron" in self.host_policy.columns:
            from spider_go_spark.functions.cron import parse_cron

            rows = (
                self.host_policy.filter(F.col("cron").isNotNull())
                .select("host", "cron")
                .collect()
            )
            self._cron_hosts = {r["host"]: r["cron"] for r in rows}
            for spec in self._cron_hosts.values():
                parse_cron(spec)
        self._has_revisit = bool(self._cron_hosts) or (
            not self._policy_empty
            and "revisit_after_rounds" in self.host_policy.columns
            and not self.host_policy.filter("revisit_after_rounds > 0").isEmpty()
        )
        # max effective per-host budget (effective ≤ max_in_flight, and
        # unknown hosts get default_budget) — sizes the hot-tier guard
        # prefix; only computed when tiering is on (the policy is a tiny
        # dim, but the job per construction is still a job)
        self._budget_max = self.cfg.default_budget
        if self.cfg.hot_tier_rounds and not self._policy_empty:
            top = self.host_policy.agg(F.max("max_in_flight")).first()[0]
            if top is not None:
                self._budget_max = max(self._budget_max, int(top))
        # a policy swap can raise budgets, shrinking the guard margin the
        # last rebalance provisioned — force a re-split before next round
        self._needs_rebalance = True

    def update_policy(self, new_policy: DataFrame) -> DataFrame:
        """Config pickup at a round boundary ≙ the reference's cron trigger
        polling flow configs, diffing them, and (re)scheduling work
        (cmd/cron-trigger/main.go:82-229). Returns the classified diff
        (added / removed / changed / unchanged per host — the
        config_diff_fullouter shape applied to the live policy), swaps the
        policy plan, and bumps config_version. Call between rounds; the
        next scheduled round sees the new policy."""
        if "revisit_after_rounds" not in new_policy.columns:
            new_policy = new_policy.withColumn(
                "revisit_after_rounds", F.lit(None).cast("int")
            )
        old = self.host_policy
        if "revisit_after_rounds" not in old.columns:
            old = old.withColumn("revisit_after_rounds", F.lit(None).cast("int"))
        cols = ["crawl_delay_ms", "max_in_flight", "robots_txt", "disabled", "revisit_after_rounds"]
        o = old.select(
            "host", F.lit(True).alias("_in_old"),
            *[F.col(c).alias(f"old_{c}") for c in cols],
        )
        n = new_policy.select(
            "host", F.lit(True).alias("_in_new"),
            *[F.col(c).alias(f"new_{c}") for c in cols],
        )
        same = F.lit(True)
        for c in cols:
            same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        diff = o.join(n, "host", "full_outer").select(
            "host",
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(same, F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("change"),
        )
        self.host_policy = new_policy
        self.cfg.config_version += 1
        self._memoize_policy()
        return diff

    # -- external document sink ---------------------------------------------------
    def _sink_ack_path(self, rnd: int) -> str:
        d = os.path.join(self.cfg.workdir, "_sink_acks", self.cfg.crawl_id)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"round-{rnd:06d}.ack")

    def _deliver_sink(self, rnd: int) -> bool:
        """Deliver round ``rnd``'s fetched docs to the sink unless already
        acked. Returns True if the sink ran."""
        if self.docs_sink is None:
            return False
        ack = self._sink_ack_path(rnd)
        if os.path.exists(ack):
            return False
        docs = self.fetched_docs.read().filter(
            self._cid & (F.col("round") == F.lit(rnd))
        )
        self.docs_sink(rnd, docs)
        tmp = ack + ".tmp"
        with open(tmp, "w") as f:
            f.write("delivered")
        os.rename(tmp, ack)  # atomic: crash before ⇒ redelivery on resume
        return True

    def _replay_unacked_sinks(self) -> None:
        """On resume: redeliver committed fetch rounds the sink never acked
        (died between round commit and sink ack)."""
        if self.docs_sink is None:
            return
        for e in self.state_log.entries(self.cfg.crawl_id):
            if e["metrics"].get("n_fetched", 0) > 0:
                self._deliver_sink(e["round"])

    def _pin_catalog_property(self, key: str, value) -> None:
        import json
        import os

        path = os.path.join(self.cfg.workdir, "_catalog.json")
        meta = {}
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
            if key in meta and meta[key] != value:
                raise ValueError(
                    f"catalog property {key}={meta[key]} does not match this "
                    f"engine's config ({value}); all crawls sharing a catalog "
                    "must agree on it"
                )
        if meta.get(key) != value:
            meta[key] = value
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f, sort_keys=True)
            os.replace(tmp, path)

    def _commit_state(self, rnd: int, metrics: dict, op: str = "round") -> None:
        """Atomic round commit + retention sweep (keep_snapshots manifests
        per table — ≙ the reference's 1 h stream retention, nats.go:149-158,
        made explicit and durable)."""
        self.state_log.commit(
            rnd,
            self._snapshot_ids(),
            self.cfg.config_version,
            metrics,
            config_fingerprint=self.cfg.fingerprint(),
            crawl_id=self.cfg.crawl_id,
            op=op,
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
            "revisit": self.revisit,
            "breaker": self.breaker,
        }

    def _snapshot_ids(self) -> dict[str, int]:
        return {name: t.current_snapshot_id() for name, t in self._tables().items()}

    @property
    def _cid(self):
        return F.col("crawl_id") == F.lit(self.cfg.crawl_id)

    @property
    def _frontier_cols(self) -> list[str]:
        return ["crawl_id", *[f.name for f in schemas.FRONTIER.fields]]

    def _candidates_from_raw(self, raw: DataFrame, rnd: int) -> DataFrame:
        """raw(url, priority, parent_hash, depth, discovery_rank) →
        canonicalized, hashed, in-batch-deduped frontier candidates
        (stamped with this engine's crawl_id)."""
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
        return c.withColumn("crawl_id", F.lit(self.cfg.crawl_id))

    def _bucket_col(self):
        return F.pmod(F.col("url_hash"), F.lit(self.cfg.frontier_buckets)).cast("int")

    def _enqueue(
        self,
        candidates: DataFrame,
        rnd: int,
        label: str,
        assigned: DataFrame | None = None,
        assigned_buckets: list[int] | None = None,
        phases: dict[str, float] | None = None,
    ) -> tuple[int, int]:
        """Filter candidates vs seen set, append to frontier + seen + lineage.
        ``assigned`` is this round's fetched assignment set — its rows leave
        the frontier in the SAME partition-scoped commit that adds the new
        candidates. Only frontier buckets holding assigned or new rows are
        read and rewritten (replace_buckets); every other bucket's data dirs
        carry over untouched. Returns (n_new, n_candidates)."""
        if phases is None:
            phases = {}
        with _timed(phases, "cand_count"):
            candidates = candidates.persist()
            n_cand = candidates.count()
        shards_all = self.seen_shards.read()
        shards = shards_all.filter(self._cid).drop("crawl_id")

        def read_seen(shard_ids):
            # physical pruning for the exact-verify anti-join: seen_urls is
            # a shard_id-bucketed table, so only the shards with Bloom
            # positives are read (an anti-join's right side can never
            # broadcast — without this every round would shuffle the whole
            # 10^10-row table to verify ~FP_rate×round_size positives)
            return self.seen_urls.read_buckets(shard_ids).filter(self._cid)

        with _timed(phases, "seen_probe"):
            # filter_unseen returns persisted+materialized; projections below
            # read the cache, and we unpersist it at the end of the commit
            if self.cfg.seen_filter == "cuckoo":
                unseen = cuckoo.filter_unseen_cuckoo(
                    candidates, shards, read_seen, self.cfg.num_shards,
                    n_buckets=self.cuckoo_buckets,
                )
            else:
                unseen = filter_unseen(
                    candidates, shards, read_seen, self.cfg.num_shards,
                    m_bits=self.m_bits, k_hashes=self.k_hashes,
                )
            new = unseen.select(*self._frontier_cols, "shard_id")
            n_new = unseen.count()

        frontier_new = new.select(*self._frontier_cols).withColumn(
            "__bucket", self._bucket_col()
        )
        # touched-bucket ids: tiny collects (≤ frontier_buckets ints) over
        # already-materialized inputs (unseen is cached; assigned is the
        # persisted ranked assignment set)
        with _timed(phases, "touched_buckets"):
            touched = {
                r["__bucket"] for r in frontier_new.select("__bucket").distinct().collect()
            }
        if assigned is not None:
            assigned_keys = assigned.select("crawl_id", "url_hash", "url_norm")
            if assigned_buckets is None:  # caller may pass its own collect
                assigned_buckets = [
                    r["__bucket"]
                    for r in assigned_keys.select(self._bucket_col().alias("__bucket"))
                    .distinct()
                    .collect()
                ]
            touched |= set(assigned_buckets)
        # NOT filtered by crawl_id: touched buckets may hold other tenants'
        # rows, which must carry through the rewrite untouched
        prev_touched = self.frontier.read_buckets(sorted(touched))
        if assigned is not None:
            # no broadcast hint: at the 10^7-fetch design point the
            # assignment set is hundreds of MB — join on (crawl_id, url_hash,
            # url_norm) over pruned buckets and let AQE pick the strategy
            prev_touched = prev_touched.join(
                assigned_keys, ["crawl_id", "url_hash", "url_norm"], "left_anti"
            )
        replaced = prev_touched.withColumn("__bucket", self._bucket_col()).unionByName(
            frontier_new
        )
        # one output file per touched bucket (repartition by the bucket key
        # before the partitioned write)
        replaced = replaced.repartition(max(len(touched), 1), "__bucket")
        with _timed(phases, "frontier_rewrite"):
            self.frontier.replace_buckets(replaced, sorted(touched), f"round-{rnd:06d}")

        with _timed(phases, "seen_append"):
            # bucket-scoped append keyed on shard_id: write cost stays
            # O(new rows) (existing shard dirs are never re-read) while the
            # verify join's read_buckets prunes to positive shards only.
            # Touched-shard collect is ≤ num_shards ints off the cached
            # unseen set; repartition gives one output file per shard.
            seen_new = new.select(
                "crawl_id", "url_hash", "url_norm", "shard_id",
                F.lit(rnd).cast("int").alias("seen_round"),
            ).withColumn("__bucket", F.col("shard_id"))
            touched_shards = sorted(
                r["shard_id"] for r in new.select("shard_id").distinct().collect()
            )
            self.seen_urls.append_buckets(
                seen_new.repartition(max(len(touched_shards), 1), "__bucket"),
                touched_shards,
                f"round-{rnd:06d}",
            )
        if self.cfg.seen_filter == "cuckoo":
            updates = cuckoo.build_cuckoo_updates(
                new.select("url_norm", "url_hash"), self.cfg.num_shards, self.cuckoo_buckets
            )
            merged = cuckoo.merge_cuckoo(shards, updates).withColumn(
                "crawl_id", F.lit(self.cfg.crawl_id)
            )
        else:
            updates = build_shard_updates(
                new.select("url_norm", "url_hash"), self.cfg.num_shards, self.m_bits, self.k_hashes
            )
            merged = merge_shards(shards, updates).withColumn(
                "crawl_id", F.lit(self.cfg.crawl_id)
            )
        # other tenants' Bloom shards carry over untouched (the shard table
        # is tiny: num_shards rows per crawl)
        others = shards_all.filter(~self._cid)
        with _timed(phases, "shard_merge"):
            self.seen_shards.overwrite(others.unionByName(merged), f"round-{rnd:06d}")

        with _timed(phases, "lineage_append"):
            self.lineage.append(
                new.select(
                    "crawl_id",
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
        if self.cfg.ingest_robots_sitemaps:
            sm = self._sitemap_seeds()
            if sm is not None:
                seeds = seeds.select("url", "priority").unionByName(sm)
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

    def _sitemap_seeds(self) -> DataFrame | None:
        """Sitemap autodiscovery: every ``Sitemap:`` URL declared in the
        policy table's robots bodies, as a (url, priority) seed frame.
        Codegen'd HOF extraction (functions/robots.sitemap_urls_col) over
        the policy table — map-only, no Python, O(hosts) rows."""
        if self._policy_empty or "robots_txt" not in self.host_policy.columns:
            return None
        from spider_go_spark.functions.robots import sitemap_urls_col

        return self.host_policy.select(
            F.explode(sitemap_urls_col("robots_txt")).alias("url"),
            F.lit(self.cfg.sitemap_seed_priority).cast("double").alias("priority"),
        )

    def add_seeds(self, seeds: DataFrame) -> dict:
        """Mid-crawl external seed submission (≙ webhook trigger,
        /root/reference/cmd/webhook-trigger/main.go:32-70: an HTTP POST can
        start new work in a live system at any time).

        Modeled as its own committed round so exactly-once resume semantics
        are preserved: the ingestion consumes a round number and commits
        round_state like any fetch round; a crash before the commit re-runs
        the ingestion idempotently (already-seen URLs dedup away)."""
        last = self.state_log.last_round(self.cfg.crawl_id)
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
        frontier at a round boundary.

        Drains exactly the ``batch_id=N`` directories present when called
        (a concurrently-arriving batch waits for the next boundary), and
        deletes them AFTER the ingestion round commits — so the staging
        area stays bounded instead of re-ingesting all history every call.
        A crash between commit and delete re-ingests those batches once,
        which the seen-set dedup absorbs (enqueue is idempotent by
        url_norm)."""
        import glob
        import shutil

        batch_dirs = sorted(glob.glob(os.path.join(staged_dir, "batch_id=*")))
        if not batch_dirs:
            # nothing staged yet (the streaming query has not committed any
            # batch): a graceful no-op, not a crashed crawl driver
            return {"n_candidates": 0, "n_new": 0, "n_fetched": 0, "seed_ingestion": 1}
        staged = self.spark.read.parquet(*batch_dirs)
        res = self.add_seeds(
            staged.select(F.col("url_norm").alias("url"), "priority")
        )
        for d in batch_dirs:
            shutil.rmtree(d)
        res["n_batches_drained"] = len(batch_dirs)
        return res

    # -- hot/cold frontier tiering ------------------------------------------------
    def _hot_bucket_ids(self) -> list[int]:
        return list(range(self.cfg.frontier_buckets))

    def _maybe_rebalance(self, rnd: int, phases: dict[str, float]) -> bool:
        """Re-split this crawl's frontier rows into hot/cold tiers when the
        tier window has elapsed (every hot_tier_rounds rounds) or a policy
        swap invalidated the guard sizing. The O(frontier) pass lives HERE,
        amortized over the window — scheduled rounds read only hot buckets.
        Other tenants' rows carry through with their existing bucket tags
        (their tier splits are theirs to maintain). Returns True if a
        rebalance ran."""
        R = self.cfg.hot_tier_rounds
        if not R or not (self._needs_rebalance or (rnd - 1) % R == 0):
            return False
        with _timed(phases, "tier_rebalance"):
            from spider_go_spark.operators.politeness import tier_split

            B = self.cfg.frontier_buckets
            tagged = self.frontier.read_buckets_tagged()
            others = tagged.filter(~self._cid)
            mine = tagged.filter(self._cid).drop("__bucket")
            H = R * self._budget_max
            placed = tier_split(mine, H, salt_n=self.cfg.salt_n).withColumn(
                "__bucket",
                (self._bucket_col() + F.col("__tier") * F.lit(B)).cast("int"),
            ).drop("__tier")
            prev_ids = set((self.frontier.snapshot().bucket_dirs or {}).keys())
            touched = sorted(prev_ids | set(range(2 * B)))
            replaced = others.unionByName(placed).repartition(
                max(len(touched), 1), "__bucket"
            )
            self.frontier.replace_buckets(replaced, touched, f"rebalance-{rnd:06d}")
        self._needs_rebalance = False
        return True

    def _policy_for_round(self, rnd: int) -> DataFrame:
        """The live policy with cron hosts' revisit_after_rounds overridden
        to this round's cron gap (rounds until the spec's next fire — a
        pure function shared with the oracle, functions/cron.cron_gap).
        The override rides the normal broadcast policy join, so the whole
        revisit pipeline (passthrough columns, adaptive interaction, retry
        precedence) is unchanged; non-cron configs return the policy
        as-is."""
        if not self._cron_hosts:
            return self.host_policy
        from spider_go_spark.functions.cron import cron_gap

        rows = [
            (h, cron_gap(spec, rnd, self.cfg.round_period_s, self.cfg.cron_epoch))
            for h, spec in sorted(self._cron_hosts.items())
        ]
        over = self.spark.createDataFrame(rows, "host string, __cron_k int")
        pol = self.host_policy.drop("cron").join(F.broadcast(over), "host", "left")
        return pol.withColumn(
            "revisit_after_rounds",
            F.coalesce(F.col("__cron_k"), F.col("revisit_after_rounds")),
        ).drop("__cron_k")

    # -- one crawl round ---------------------------------------------------------
    def run_round(self, rnd: int) -> dict:
        phases: dict[str, float] = {}
        if self.cfg.hot_tier_rounds:
            rebalanced = self._maybe_rebalance(rnd, phases)
            # physical prune: the scheduling pool is the hot buckets only
            frontier = self.frontier.read_buckets(self._hot_bucket_ids()).filter(
                self._cid
            )
        else:
            rebalanced = False
            frontier = self.frontier.read().filter(self._cid)
        # revisit eligibility (≙ cron trigger firing, cmd/cron-trigger/
        # main.go:82-229): fetched URLs whose recrawl round has arrived
        # rejoin the scheduling pool. Invariant: a URL is in the revisit
        # queue XOR the frontier (it left the frontier when assigned; link
        # rediscovery dedups against the seen set), so the union never
        # duplicates.
        # (skipped entirely — no extra jobs — when the policy has no revisit
        # intervals and the queue is empty; row_count is manifest metadata)
        use_retry = self.cfg.retry_max_attempts > 1
        use_revisit = self._has_revisit or self.revisit.snapshot().row_count > 0
        adaptive = self.cfg.adaptive_revisit and use_revisit
        pool = frontier
        if use_retry or use_revisit:
            # attempt rides through scheduling + fetch so the retry path
            # knows how many attempts a row has consumed
            pool = pool.withColumn("attempt", F.lit(0).cast("int"))
        if use_revisit:
            # first-fetch rows have no change-detection state yet
            pool = pool.withColumn(
                "last_hash", F.lit(None).cast("long")
            ).withColumn("interval", F.lit(None).cast("int"))
            rev_all = self.revisit.read()
            eligible = rev_all.filter(
                self._cid & (F.col("next_round") <= F.lit(rnd))
            ).drop("next_round")
            pool = pool.unionByName(eligible)
        use_breaker = self.cfg.breaker_threshold > 0
        if use_breaker:
            # circuit-breaker quarantine: hosts inside an unexpired cooldown
            # are excluded BEFORE the politeness cut, so they consume no
            # budget and their frontier rows stay queued untouched. The
            # quarantined set is tiny (failing hosts only — the state table
            # holds no healthy-host rows), so this is a broadcast anti-join.
            qhosts = (
                self.breaker.read()
                .filter(self._cid & (F.col("quarantined_until") >= F.lit(rnd)))
                .select("host")
            )
            pool = pool.join(F.broadcast(qhosts), "host", "left_anti")
        with _timed(phases, "schedule_rank"):
            assignments = schedule_round(
                pool,
                self._policy_for_round(rnd),
                default_budget=self.cfg.default_budget,
                round_budget_ms=self.cfg.round_budget_ms,
                salt_n=self.cfg.salt_n,
                policy_empty=self._policy_empty,
                agent=self.cfg.user_agent,
            )
            # global_rank returns its result persisted+materialized (it must
            # pin the sampled range boundaries); derive lazily from that cache
            ranked = global_rank(assignments, frontier_order(), rank_col="fetch_rank")
            assignments = ranked.withColumn("round", F.lit(rnd).cast("int"))
            n_assigned = ranked.count()
        if n_assigned == 0:
            if self.cfg.hot_tier_rounds and not rebalanced:
                # an empty HOT tier does not mean an empty frontier: force
                # a re-split and retry once — after a fresh rebalance an
                # empty hot tier proves the frontier itself is drained (hot
                # is every host's top-H), so the retry terminates
                ranked.unpersist()
                self._needs_rebalance = True
                return self.run_round(rnd)
            ranked.unpersist()
            n_pending = rev_all.filter(self._cid).count() if use_revisit else 0
            # quarantined hosts whose cooldown outlives this round keep the
            # crawl alive (their frontier rows become schedulable again on
            # expiry) — same keep-alive contract as pending revisits
            n_quarantined = (
                self.breaker.read()
                .filter(self._cid & (F.col("quarantined_until") > F.lit(rnd)))
                .count()
                if use_breaker
                else 0
            )
            metrics = {
                "n_assigned": 0, "n_fetched": 0, "n_ok": 0, "n_candidates": 0,
                "n_new": 0, "n_revisit_pending": n_pending,
                "n_quarantined": n_quarantined,
            }
            self._commit_state(rnd, metrics)
            return metrics

        # AQE coalesces by *bytes*, which under-parallelizes the CPU-heavy
        # Arrow fetch stage (URL rows are tiny, fetch work per row is not):
        # spread assignments across all cores explicitly before mapInPandas
        par = self.spark.sparkContext.defaultParallelism
        fetch_input = assignments.repartition(par, "url_hash")
        # priority/depth ride through the fetch so link extraction needs no
        # join back to the assignment set (at 10^7 fetches/round that join
        # shuffled every extracted link against every assignment)
        pt: tuple[str, ...] = ("priority", "depth")
        if use_retry or adaptive:
            # retry/adaptive-revisit entries must round-trip the full
            # frontier identity; the extra int columns through the Arrow
            # fetch avoid a join of the failure/refetch set back against
            # the assignments
            pt += ("attempt", "parent_hash", "discovery_rank", "host_hash")
        if adaptive:
            # change detection reads (last_hash, interval, policy base) off
            # the fetched row itself — passthrough, never a join against
            # the fetched-docs history
            pt += ("revisit_after_rounds", "last_hash", "interval")
        fetched = synthetic_fetch(
            fetch_input, self.cfg.n_urls, self.cfg.n_hosts,
            passthrough=pt, transient_every=self.cfg.transient_every,
            change_period=self.cfg.change_period,
            dead_hosts=tuple(self.cfg.dead_hosts),
        ).persist()
        doc_cols = [f.name for f in schemas.FETCHED_DOCS.fields]
        with _timed(phases, "fetch_write"):
            self.fetched_docs.append(
                fetched.select(*doc_cols).withColumn(
                    "crawl_id", F.lit(self.cfg.crawl_id)
                ),
                f"round-{rnd:06d}",
            )

        # per-partition fetch metrics (north rule): one row per task of the
        # fetch stage — observability into skew without any extra shuffle
        # beyond the tiny metric agg itself. Collected once (≤ par rows):
        # the driver derives the round's n_ok from it instead of running a
        # second full count pass over the cached fetch output.
        with _timed(phases, "fetch_metrics"):
            metric_rows = fetched.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.count(F.lit(1)).alias("n_fetched"),
                F.count(F.when(F.col("status") == "200", 1)).alias("n_ok"),
                F.sum(F.size("out_links")).cast("long").alias("n_links_out"),
            ).collect()
        n_ok = sum(r["n_ok"] for r in metric_rows)
        metrics_df = self.spark.createDataFrame(
            [
                (self.cfg.crawl_id, rnd, r["partition_id"], r["n_fetched"], r["n_ok"], r["n_links_out"])
                for r in metric_rows
            ],
            schemas.with_crawl_id(schemas.ROUND_METRICS),
        )
        with _timed(phases, "fetch_metrics"):
            self.fetch_metrics.append(metrics_df, f"round-{rnd:06d}")

        if use_breaker:
            # per-host round outcome folded into the breaker state. The
            # update is O(hosts fetched this round) — one tiny agg over the
            # cached fetch output full-outer-joined with the (failing-hosts-
            # only) state table; quarantined hosts fetch nothing, so their
            # rows ride through unchanged. All int math, bit-identical on
            # resume.
            with _timed(phases, "breaker"):
                outcome = fetched.groupBy("host").agg(
                    F.count(F.when(F.col("status") == "200", 1))
                    .cast("int")
                    .alias("n_ok_h"),
                    F.count(F.when(F.col("status") != "200", 1))
                    .cast("int")
                    .alias("n_fail_h"),
                )
                prior = self.breaker.read().filter(self._cid).select(
                    "host", "streak", "trips", "quarantined_until"
                )
                j = prior.join(outcome, "host", "full_outer").select(
                    "host",
                    F.coalesce("streak", F.lit(0)).alias("s0"),
                    F.coalesce("trips", F.lit(0)).alias("t0"),
                    F.coalesce("quarantined_until", F.lit(-1)).alias("q0"),
                    "n_ok_h",
                    F.coalesce("n_fail_h", F.lit(0)).alias("nf"),
                )
                thr = self.cfg.breaker_threshold
                cool = self.cfg.breaker_cooldown_rounds
                cap = self.cfg.breaker_max_cooldown
                fetched_host = F.col("n_ok_h").isNotNull()
                any_ok = fetched_host & (F.col("n_ok_h") > 0)
                s1 = F.col("s0") + F.col("nf")
                tripped = fetched_host & ~any_ok & (s1 >= thr)
                j = j.withColumn(
                    "t1",
                    F.when(any_ok, 0)
                    .when(tripped, F.col("t0") + 1)
                    .otherwise(F.col("t0"))
                    .cast("int"),
                )
                # exponent clamped to [0, 24]: the when(tripped) guard means
                # only t1 ≥ 1 rows use it, but Spark evaluates both branches
                # columnar-eagerly, so the untripped rows' t1−1 = −1 must
                # not reach shiftleft (Java wraps negative shifts). SQL-side
                # shiftleft: the pyspark wrapper only takes a literal shift.
                cooldown = F.expr(
                    f"least(shiftleft({cool}, "
                    f"cast(greatest(least(t1 - 1, 24), 0) as int)), {cap})"
                )
                new_state = j.select(
                    "host",
                    F.when(any_ok | tripped, 0)
                    .when(fetched_host, s1)
                    .otherwise(F.col("s0"))
                    .cast("int")
                    .alias("streak"),
                    F.col("t1").alias("trips"),
                    F.when(tripped, F.lit(rnd) + cooldown)
                    .otherwise(F.col("q0"))
                    .cast("int")
                    .alias("quarantined_until"),
                ).filter(  # healthy hosts carry no row
                    (F.col("streak") > 0)
                    | (F.col("trips") > 0)
                    | (F.col("quarantined_until") > F.lit(rnd))
                ).withColumn("crawl_id", F.lit(self.cfg.crawl_id))
                others = self.breaker.read().filter(~self._cid)
                self.breaker.overwrite(
                    others.unionByName(new_state.select(*others.columns)),
                    f"round-{rnd:06d}",
                )

        # link extraction from the interleaved spans — built-in array fns,
        # JVM-side (≙ dep fan-out loop workflow.go:140-191 / explode(links))
        # parent priority/depth come straight off the fetched rows (fetch
        # passthrough) — a pure explode+projection, no join, no shuffle
        raw = fetched.select(
            F.col("url_hash").alias("parent_hash"),
            F.col("fetch_rank"),
            F.posexplode(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == F.lit("link")),
                    lambda s: s["text"],
                )
            ).alias("pos", "url"),
            F.col("priority"),
            F.col("depth").alias("parent_depth"),
        ).select(
            "url",
            "priority",
            "parent_hash",
            (F.col("parent_depth") + 1).alias("depth"),
            (F.col("fetch_rank") * LINK_STRIDE + F.col("pos")).alias("discovery_rank"),
        )
        # depth cap BEFORE canonicalize/hash/dedup: over-deep links never
        # cost a shuffle (and the frontier can't be flooded by trap loops)
        if self.cfg.max_depth:
            raw = raw.filter(F.col("depth") <= self.cfg.max_depth)
        candidates = self._candidates_from_raw(raw, rnd + 1)

        # assigned rows leave the frontier inside _enqueue's partition-scoped
        # commit (bucket-pruned anti-join — no broadcast of the assignment
        # set, no whole-frontier rewrite). Bucket ids are collected ONCE off
        # the persisted assignment set and shared with the revisit rewrite.
        with _timed(phases, "assigned_buckets"):
            assigned_buckets = sorted(
                r["__b"]
                for r in assignments.select(self._bucket_col().alias("__b"))
                .distinct()
                .collect()
            )
        n_new, n_cand = self._enqueue(
            candidates, rnd + 1, "links",
            assigned=assignments, assigned_buckets=assigned_buckets,
            phases=phases,
        )

        # revisit queue maintenance (partition-scoped, like the frontier):
        # assigned rows leave the queue; assignments on hosts with a revisit
        # interval (re)enter with next_round = rnd + k. A URL not scheduled
        # this round (over budget) stays queued and eligible.
        n_pending = 0
        if use_revisit or use_retry:
            t_rev = time.time()
            keys = ["crawl_id", "url_hash", "url_norm"]
            base_k = F.col("revisit_after_rounds")
            has_revisit = base_k.isNotNull() & (base_k > 0)
            if adaptive:
                # change detection off the fetched row (identity + state rode
                # through the Arrow fetch as passthrough): unchanged content
                # doubles the interval up to the cap; a change — or a failed
                # refetch — resets it to the policy base. last_hash only
                # advances on a 200 (a 404/503 tells us nothing about content).
                unchanged = (
                    (F.col("status") == "200")
                    & F.col("last_hash").isNotNull()
                    & (F.col("last_hash") == F.col("content_hash"))
                )
                new_int = F.when(
                    unchanged,
                    F.least(
                        F.coalesce(F.col("interval"), base_k) * 2,
                        F.lit(self.cfg.revisit_max_interval),
                    ),
                ).otherwise(base_k).cast("int")
                nr = (F.lit(rnd) + new_int).cast("int")
                new_revisits = fetched.filter(has_revisit).select(
                    F.lit(self.cfg.crawl_id).alias("crawl_id"),
                    "url", "url_norm", "url_hash", "host", "host_hash",
                    "depth", "priority", "parent_hash",
                    nr.alias("discovered_round"),
                    "discovery_rank",
                    F.lit(0).cast("int").alias("attempt"),
                    nr.alias("next_round"),
                    F.when(F.col("status") == "200", F.col("content_hash"))
                    .otherwise(F.col("last_hash"))
                    .cast("long")
                    .alias("last_hash"),
                    new_int.alias("interval"),
                )
            else:
                nr = (F.lit(rnd) + base_k).cast("int")
                new_revisits = assignments.filter(has_revisit).select(
                    "crawl_id", "url", "url_norm", "url_hash", "host", "host_hash",
                    "depth", "priority", "parent_hash",
                    nr.alias("discovered_round"),  # re-enters the scheduler
                    # order at its eligibility round
                    "discovery_rank",
                    F.lit(0).cast("int").alias("attempt"),  # success resets
                    nr.alias("next_round"),
                    F.lit(None).cast("long").alias("last_hash"),
                    base_k.cast("int").alias("interval"),
                )
            if use_retry:
                # retry-with-backoff: non-200 fetches with attempts left
                # re-enter the queue; built off the persisted fetch output
                # (identity columns rode through as passthrough — no join
                # back against the assignment set)
                nxt = F.lit(rnd + self.cfg.retry_backoff_rounds).cast("int")
                retry_entries = fetched.filter(
                    (F.col("status") != "200")
                    & (F.col("attempt") < F.lit(self.cfg.retry_max_attempts - 1))
                ).select(
                    F.lit(self.cfg.crawl_id).alias("crawl_id"),
                    "url", "url_norm", "url_hash", "host", "host_hash",
                    "depth", "priority", "parent_hash",
                    nxt.alias("discovered_round"),
                    "discovery_rank",
                    (F.col("attempt") + 1).cast("int").alias("attempt"),
                    nxt.alias("next_round"),
                    # a failed fetch preserves whatever change-detection
                    # state the row carried (nothing, unless adaptive)
                    (
                        F.col("last_hash") if adaptive else F.lit(None)
                    ).cast("long").alias("last_hash"),
                    (
                        F.col("interval") if adaptive else F.lit(None)
                    ).cast("int").alias("interval"),
                )
                # a failed fetch's retry beats its host's policy revisit
                new_revisits = new_revisits.join(
                    retry_entries.select(*keys), keys, "left_anti"
                ).unionByName(retry_entries)
            touched_rev = assigned_buckets
            remaining = self.revisit.read_buckets(touched_rev).join(
                assignments.select(*keys), keys, "left_anti"
            )
            replaced = (
                remaining.unionByName(new_revisits)
                .withColumn("__bucket", self._bucket_col())
                .repartition(max(len(touched_rev), 1), "__bucket")
            )
            self.revisit.replace_buckets(replaced, touched_rev, f"round-{rnd:06d}")
            n_pending = self.revisit.snapshot().row_count
            phases["revisit"] = round(time.time() - t_rev, 3)

        # n_fetched = every fetch attempt (matches the fetch_metrics table);
        # n_ok = 200s only, summed from the collected per-partition metrics
        metrics = {
            "n_assigned": n_assigned,
            "n_fetched": n_assigned,
            "n_ok": n_ok,
            "n_candidates": n_cand,
            "n_new": n_new,
            "n_revisit_pending": n_pending,
            "phase_sec": phases,
        }
        with _timed(phases, "commit"):
            self._commit_state(rnd, metrics)
        self._deliver_sink(rnd)
        ranked.unpersist()
        fetched.unpersist()
        return metrics

    # -- full crawl / resume ------------------------------------------------------
    def crawl(self, seeds: DataFrame | None = None, max_rounds: int | None = None) -> list[dict]:
        """Run (or resume) the crawl to completion. If a committed round_state
        exists, resumes from it (bit-identically); else requires ``seeds``."""
        max_rounds = max_rounds or self.cfg.max_rounds
        state = self.state_log.restore(self._tables(), self.cfg.crawl_id)
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
            # redeliver any committed-but-unacked sink rounds (died between
            # round commit and external delivery)
            self._replay_unacked_sinks()
        for rnd in range(next_round, max_rounds + 1):
            m = self.run_round(rnd)
            history.append(m)
            # terminate when the frontier is exhausted AND no refetch is
            # scheduled; pending revisits keep the loop alive through empty
            # rounds until their eligibility round arrives (cron semantics)
            if (
                m.get("n_assigned", 1) == 0
                and m.get("n_revisit_pending", 0) == 0
                and m.get("n_quarantined", 0) == 0
            ):
                break
        return history

    # -- scoped cascade delete ----------------------------------------------------
    def _scoped_bucket_delete(self, table: SnapshotTable, label: str) -> None:
        """Partition-scoped delete of this crawl's rows from a bucketed
        table: only buckets holding the crawl's rows are re-read and
        rewritten; every other bucket's dirs carry over untouched. Bucket
        membership comes from the manifest tags (read_buckets_tagged), so
        this works for ANY bucket transform — including tiered frontiers,
        whose bucket id encodes hot/cold state no row column can
        reconstruct."""
        tagged = table.read_buckets_tagged()
        touched = sorted(
            r["__bucket"]
            for r in tagged.filter(self._cid).select("__bucket").distinct().collect()
        )
        if touched:
            kept = (
                table.read_buckets_tagged(touched)
                .filter(~self._cid)
                .repartition(max(len(touched), 1), "__bucket")
            )
            table.replace_buckets(kept, touched, label)

    def maintain(self, min_dirs: int = 4) -> dict:
        """Table maintenance: compact every engine table whose current
        snapshot spans ``min_dirs``+ data dirs, then commit an
        ``op="maintain"`` state entry so the compacted snapshots become the
        durable restore point (otherwise the next resume would roll them
        back). ≙ Iceberg's rewrite_data_files + expire_snapshots services.

        Why: append tables (fetched_docs, lineage, fetch_metrics) and the
        bucket-append seen set grow one data dir (per bucket) per round,
        so reads union R dirs after R rounds —
        planning time and open-file count grow without bound. At 100 TB this
        runs as its own scheduled job between rounds (it takes the same
        single-writer catalog lock as a round; here: just call it from the
        driver loop). The retention sweep inside ``_commit_state`` then
        reclaims the superseded dirs once they age out.
        """
        compacted: dict[str, dict] = {}
        for name, t in self._tables().items():
            snap = t.snapshot()
            if snap.bucket_dirs is not None:
                # replace-bucketed tables (frontier, revisit) hold exactly
                # one dir/file per bucket by construction — compacting them
                # would be a full-table rewrite for zero layout gain. The
                # APPEND-bucketed seen set, however, gains one dir per
                # bucket per round: fold ONLY the overgrown bucket chains
                # (compact_buckets — partition-scoped, cost ∝ rows in those
                # buckets, never the whole table), which also bounds the
                # manifest at O(buckets · min_dirs) instead of O(rounds ·
                # buckets) — the manifest is driver-read on every commit,
                # so its growth is a metadata scale-killer at 10^10 URLs
                before = t.data_file_stats()
                if t.compact_buckets(min_dirs=min_dirs, label="compact") is not None:
                    after = t.data_file_stats()
                    compacted[name] = {
                        "dirs_before": before["n_data_dirs"],
                        "dirs_after": after["n_data_dirs"],
                        "rows": after["row_count"],
                    }
                continue
            stats = t.data_file_stats()
            if stats["n_data_dirs"] >= min_dirs:
                t.compact(label="compact")
                after = t.data_file_stats()
                compacted[name] = {
                    "dirs_before": stats["n_data_dirs"],
                    "dirs_after": after["n_data_dirs"],
                    "rows": after["row_count"],
                }
        metrics = {"maintain_compacted": sorted(compacted)}
        self._commit_state(
            self.state_log.last_round(self.cfg.crawl_id) or 0, metrics, op="maintain"
        )
        return compacted

    def drop_crawl(self) -> dict:
        """Remove EVERY row of this engine's crawl_id from every engine
        table — ≙ the reference's DeleteFlow cascade (flow → actions → deps
        → contexts, storage_workflow_mongodb.go:560-609) — leaving other
        crawls in the shared catalog untouched.

        The frontier delete is partition-scoped (only buckets holding this
        crawl's rows are rewritten); the append-only tables get one
        compacting overwrite each (scoped deletes are rare administrative
        ops — full-history rewrite is acceptable there, matching Iceberg's
        copy-on-write DELETE). A committed ``drop`` entry makes the
        post-delete snapshots the new restore point, so the dropped crawl
        no longer resumes and other crawls resume over the cleaned state."""
        label = f"drop-{self.cfg.crawl_id}"
        # the frontier, the revisit queue AND the seen set are bucketed
        # tables: all must take the partition-scoped delete (a flat
        # overwrite would commit a snapshot with no bucket mapping,
        # breaking the next crawl round's bucket-scoped commits on the
        # shared catalog)
        self._scoped_bucket_delete(self.frontier, label)
        self._scoped_bucket_delete(self.revisit, label)
        self._scoped_bucket_delete(self.seen_urls, label)
        for name, t in self._tables().items():
            if name in ("frontier", "revisit", "seen_urls"):
                continue
            t.overwrite(t.read().filter(~self._cid), label)
        metrics = {"dropped_crawl": self.cfg.crawl_id}
        self._commit_state(self.state_log.last_round(self.cfg.crawl_id) or 0, metrics, op="drop")
        return metrics

    def forget_urls(self, urls: list[str]) -> dict:
        """Takedown / robots-removal compliance: erase the given URLs from
        this crawl's knowledge so they can be re-discovered and re-fetched
        as if never crawled. Removes, scoped to this crawl_id: the exact
        ``seen_urls`` rows (rewriting ONLY the victims' shard buckets), the
        approximate-filter fingerprints (cuckoo: O(1) per-item deletes of
        exactly the present victims; bloom: rebuild of only the affected
        shards from the remaining exact rows — bitmaps can't un-set bits),
        pending ``frontier``/``revisit`` entries, and the fetched
        documents + lineage (compacting overwrite — takedowns are rare
        admin ops). Commits an ``op="forget"`` state entry: resume
        continues the crawl over the cleaned state; the round counter is
        not consumed.

        No reference analogue (spider-go has per-flow DeleteFlow only,
        storage_workflow_mongodb.go:560-609); per-URL retraction is the
        north rule's seen-set made operable under takedown obligations."""
        from spider_go_spark.functions.urls import canonicalize_one

        norms = sorted({n for n in (canonicalize_one(u) for u in urls) if n})
        label = f"forget-{self.cfg.crawl_id}"
        if not norms:
            return {"forget_requested": 0, "forget_present": 0}
        victim = self._cid & F.col("url_norm").isin(norms)
        victims = self.spark.createDataFrame(
            [(n,) for n in norms], "url_norm string"
        ).withColumn("url_hash", url_hash_col("url_norm"))
        vshards = sorted(
            r["s"]
            for r in victims.select(
                F.pmod("url_hash", F.lit(self.cfg.num_shards)).cast("int").alias("s")
            ).distinct().collect()
        )
        # which victims the crawl actually knows (cuckoo's delete contract:
        # only inserted items may be deleted; also the honest metric)
        present = victims.join(
            self.seen_urls.read_buckets(vshards).filter(self._cid).select("url_norm"),
            "url_norm",
            "semi",
        ).persist()
        n_present = present.count()

        # 1. exact seen rows: rewrite only the victims' shard buckets
        kept = (
            self.seen_urls.read_buckets(vshards)
            .filter(~victim)
            .withColumn("__bucket", F.col("shard_id"))
            .repartition(max(len(vshards), 1), "__bucket")
        )
        self.seen_urls.replace_buckets(kept, vshards, label)

        # 2. approximate filter
        shards_all = self.seen_shards.read()
        mine = shards_all.filter(self._cid).drop("crawl_id")
        others = shards_all.filter(~self._cid)
        if self.cfg.seen_filter == "cuckoo":
            updated = cuckoo.delete_cuckoo(mine, present, self.cfg.num_shards)
        else:
            remaining = self.seen_urls.read_buckets(vshards).filter(self._cid)
            rebuilt = build_shard_updates(
                remaining.select("url_norm", "url_hash"),
                self.cfg.num_shards, self.m_bits, self.k_hashes,
            )
            updated = mine.filter(
                ~F.col("shard_id").isin([int(s) for s in vshards])
            ).unionByName(rebuilt)
        self.seen_shards.overwrite(
            others.unionByName(updated.withColumn("crawl_id", F.lit(self.cfg.crawl_id))),
            label,
        )

        # 3. pending frontier / revisit entries for the victims
        for table in (self.frontier, self.revisit):
            tagged = table.read_buckets_tagged()
            touched = sorted(
                r["__bucket"]
                for r in tagged.filter(victim).select("__bucket").distinct().collect()
            )
            if touched:
                keep = (
                    table.read_buckets_tagged(touched)
                    .filter(~victim)
                    .repartition(max(len(touched), 1), "__bucket")
                )
                table.replace_buckets(keep, touched, label)

        # 4. the fetched documents + lineage themselves
        for t in (self.fetched_docs, self.lineage):
            t.overwrite(t.read().filter(~victim), label)

        present.unpersist()
        metrics = {"forget_requested": len(norms), "forget_present": n_present}
        self._commit_state(
            self.state_log.last_round(self.cfg.crawl_id) or 0, metrics, op="forget"
        )
        return metrics
