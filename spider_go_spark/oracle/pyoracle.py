"""Pure-Python oracle of the reference's scheduler semantics.

Implements, in plain single-threaded Python, exactly the semantics documented
in SURVEY.md §5.1 from the reference:

- FIFO delivery order (/root/reference/pkg/spider/nats.go:196) + fan-out in
  dependency order (workflow.go:140) → the strict total order
  ``(-priority, discovered_round, discovery_rank, url_norm)``,
- per-consumer budget (messenger_worker_nats.go:103-106) → per-host
  per-round budget with crawl-delay reduction,
- dedup-on-insert via unique index (storage_workflow_mongodb.go:81-119) →
  a URL enters the seen set when enqueued, first discovery wins,
- disabled check (workflow.go:100-102) → disabled-host + robots filters.

It reuses the engine's own canonicalization and synthetic-graph functions on
single-element inputs, so any divergence the tests catch is in the Spark
plumbing (shuffles, windows, joins), not in incidental reimplementation
drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spider_go_spark.functions.robots import (
    robots_allowed_one,
    robots_crawl_delay_ms,
    robots_sitemaps,
)
from spider_go_spark.functions.urls import canonicalize_one, host_of_one, path_of_series
from spider_go_spark.sources.webgraph import (
    content_hash_of_nodes,
    node_id_of_url,
    out_links_of_nodes,
    status_of_nodes,
)

import pandas as pd

LINK_STRIDE = 4096


@dataclass
class OracleEntry:
    url: str
    url_norm: str
    host: str
    depth: int
    priority: float
    discovered_round: int
    discovery_rank: int
    attempt: int = 0  # fetch attempts already consumed (retry entries ≥ 1)
    last_hash: int | None = None  # content hash at last successful fetch
    interval: int | None = None  # revisit interval that produced next_round

    def order_key(self):
        return (-self.priority, self.discovered_round, self.discovery_rank, self.url_norm)


@dataclass
class OracleResult:
    fetched: list[dict] = field(default_factory=list)  # round, fetch_rank, url_norm, status
    seen: set[str] = field(default_factory=set)
    rounds: list[dict] = field(default_factory=list)


def _path_of(url_norm: str) -> str:
    p = path_of_series(pd.Series([url_norm])).iloc[0]
    return p if p else "/"


def crawl_oracle(
    seeds: list[tuple[str, float]],
    host_policy: dict[str, dict],
    n_urls: int,
    n_hosts: int,
    default_budget: int = 10,
    round_budget_ms: int = 10_000,
    max_rounds: int = 10,
    retry_max_attempts: int = 1,
    retry_backoff_rounds: int = 1,
    transient_every: int = 0,
    adaptive_revisit: bool = False,
    revisit_max_interval: int = 16,
    change_period: int = 0,
    round_period_s: int = 3600,
    cron_epoch: str = "2024-01-01T00:00:00",
    user_agent: str = "*",
    ingest_robots_sitemaps: bool = False,
    sitemap_seed_priority: float = 0.0,
    breaker_threshold: int = 0,
    breaker_cooldown_rounds: int = 2,
    breaker_max_cooldown: int = 16,
    dead_hosts: tuple = (),
) -> OracleResult:
    res = OracleResult()
    frontier: dict[str, OracleEntry] = {}
    if ingest_robots_sitemaps:
        # sitemap autodiscovery twin (round_loop._sitemap_seeds): robots
        # Sitemap URLs join the round-0 seed list
        seeds = list(seeds) + [
            (u, sitemap_seed_priority)
            for pol in host_policy.values()
            for u in robots_sitemaps(pol.get("robots_txt"))
        ]
    # revisit queue (≙ cron-trigger scheduled jobs): url_norm → (entry
    # carrying discovered_round = eligibility round, next_round). A URL is
    # in the frontier XOR the revisit queue.
    revisit: dict[str, tuple[OracleEntry, int]] = {}
    # circuit-breaker state: host → (streak, trips, quarantined_until);
    # healthy hosts carry no entry (mirrors the engine's breaker table)
    breaker: dict[str, tuple[int, int, int]] = {}

    # --- round 0: seed injection (first-wins per canonical URL: highest
    # priority, then smallest raw url string — mirrors the engine's min-struct
    # dedup key)
    by_norm: dict[str, tuple] = {}
    for raw_url, prio in seeds:
        norm = canonicalize_one(raw_url)
        if norm is None:
            continue
        key = (-prio, 0, prio, 0, raw_url)
        if norm not in by_norm or key < by_norm[norm]:
            by_norm[norm] = key
    for norm, key in by_norm.items():
        if norm in res.seen:
            continue
        res.seen.add(norm)
        frontier[norm] = OracleEntry(
            url=key[4], url_norm=norm, host=host_of_one(norm), depth=0,
            priority=key[2], discovered_round=0, discovery_rank=0,
        )
    res.rounds.append({"round": 0, "n_new": len(frontier)})

    # --- crawl rounds
    for rnd in range(1, max_rounds + 1):
        # scheduling pool = frontier ∪ revisit entries whose round arrived
        pool = list(frontier.values()) + [
            e for e, nxt in revisit.values() if nxt <= rnd
        ]
        # politeness: filter + per-host budget cut
        eligible: list[OracleEntry] = []
        for e in pool:
            if (
                breaker_threshold
                and e.host in breaker
                and breaker[e.host][2] >= rnd
            ):
                continue  # quarantined: consumes no budget, stays queued
            pol = host_policy.get(e.host, {})
            if pol.get("disabled", False):
                continue
            robots = pol.get("robots_txt")
            if robots and not robots_allowed_one(
                robots, _path_of(e.url_norm), user_agent
            ):
                continue
            eligible.append(e)
        by_host: dict[str, list[OracleEntry]] = {}
        for e in eligible:
            by_host.setdefault(e.host, []).append(e)
        assignments: list[OracleEntry] = []
        for host, entries in by_host.items():
            pol = host_policy.get(host, {})
            budget = pol.get("max_in_flight", default_budget)
            # effective delay = stricter of policy delay and the robots
            # group's Crawl-delay (mirrors politeness.apply_policy)
            delay = max(
                pol.get("crawl_delay_ms", 0) or 0,
                robots_crawl_delay_ms(pol.get("robots_txt"), user_agent) or 0,
            )
            if delay and delay > 0:
                budget = min(budget, max(1, int(round_budget_ms / delay)))
            entries.sort(key=OracleEntry.order_key)
            assignments.extend(entries[:budget])
        assignments.sort(key=OracleEntry.order_key)
        if not assignments:
            res.rounds.append({"round": rnd, "n_assigned": 0})
            # pending refetches — and unexpired quarantines — keep the
            # crawl alive through empty rounds
            if revisit or any(q > rnd for _, _, q in breaker.values()):
                continue
            break

        # fetch in global order
        new_candidates: list[tuple[tuple, str, OracleEntry]] = []
        outcomes: dict[str, list[int]] = {}  # host -> [n_ok, n_fail]
        for fetch_rank, e in enumerate(assignments, start=1):
            node = int(node_id_of_url(pd.Series([e.url_norm])).iloc[0])
            status = str(
                status_of_nodes(
                    np.array([node]),
                    attempts=np.array([e.attempt]),
                    transient_every=transient_every,
                )[0]
            )
            if e.host in dead_hosts:
                status = "503"
            res.fetched.append(
                {"round": rnd, "fetch_rank": fetch_rank, "url_norm": e.url_norm, "status": status}
            )
            o = outcomes.setdefault(e.host, [0, 0])
            o[0 if status == "200" else 1] += 1
            frontier.pop(e.url_norm, None)  # revisit-sourced rows aren't here
            revisit.pop(e.url_norm, None)
            chash = int(
                content_hash_of_nodes(
                    np.array([node]), np.array([rnd]), change_period
                )[0]
            )
            pol_h = host_policy.get(e.host, {})
            if pol_h.get("cron"):
                # cron-spec schedule: same shared pure function the engine's
                # per-round policy override calls (functions/cron.cron_gap)
                from spider_go_spark.functions.cron import cron_gap

                k = cron_gap(pol_h["cron"], rnd, round_period_s, cron_epoch)
            else:
                k = pol_h.get("revisit_after_rounds") or 0
            if k > 0:  # (re)schedule the refetch; re-enters the scheduler
                # order at its eligibility round. Adaptive (change-detection)
                # mode: unchanged content doubles the interval up to the cap;
                # a change or a failed refetch resets to the policy base, and
                # last_hash only advances on a 200.
                if (
                    adaptive_revisit
                    and status == "200"
                    and e.last_hash is not None
                    and e.last_hash == chash
                ):
                    interval = min((e.interval or k) * 2, revisit_max_interval)
                else:
                    interval = k
                if adaptive_revisit:
                    last = chash if status == "200" else e.last_hash
                else:
                    last = None
                revisit[e.url_norm] = (
                    OracleEntry(
                        url=e.url, url_norm=e.url_norm, host=e.host, depth=e.depth,
                        priority=e.priority, discovered_round=rnd + interval,
                        discovery_rank=e.discovery_rank,
                        last_hash=last, interval=interval,
                    ),
                    rnd + interval,
                )
            if status != "200" and e.attempt + 1 < retry_max_attempts:
                # retry-with-backoff; overwrites (= takes precedence over)
                # any policy revisit of the same URL, like the engine's
                # left-anti precedence. Change-detection state is preserved
                # across the failed attempt.
                nxt = rnd + retry_backoff_rounds
                revisit[e.url_norm] = (
                    OracleEntry(
                        url=e.url, url_norm=e.url_norm, host=e.host, depth=e.depth,
                        priority=e.priority, discovered_round=nxt,
                        discovery_rank=e.discovery_rank, attempt=e.attempt + 1,
                        last_hash=e.last_hash if adaptive_revisit else None,
                        interval=e.interval if adaptive_revisit else None,
                    ),
                    nxt,
                )
            if status != "200":
                continue
            links = out_links_of_nodes(np.array([node]), n_urls, n_hosts)[0]
            for pos, raw in enumerate(links):
                norm = canonicalize_one(raw)
                if norm is None:
                    continue
                dr = fetch_rank * LINK_STRIDE + pos
                cand = OracleEntry(
                    url=raw, url_norm=norm, host=host_of_one(norm), depth=e.depth + 1,
                    priority=e.priority, discovered_round=rnd + 1, discovery_rank=dr,
                )
                new_candidates.append(((-cand.priority, dr), norm, cand))

        # in-round dedup (first in scheduler order wins) + seen filter + enqueue
        new_candidates.sort(key=lambda t: t[0])
        n_new = 0
        batch_norms: set[str] = set()
        for _, norm, cand in new_candidates:
            if norm in batch_norms or norm in res.seen:
                continue
            batch_norms.add(norm)
            res.seen.add(norm)
            frontier[norm] = cand
            n_new += 1
        if breaker_threshold:
            # round-granular breaker fold, mirroring the engine's full-outer
            # state update: any success resets, an all-failure round adds its
            # failures; crossing the threshold trips the host into an
            # exponentially growing quarantine (capped)
            for host, (n_ok, n_fail) in outcomes.items():
                s, t, q = breaker.get(host, (0, 0, -1))
                if n_ok > 0:
                    s, t = 0, 0
                else:
                    s += n_fail
                    if s >= breaker_threshold:
                        t += 1
                        q = rnd + min(
                            breaker_cooldown_rounds << min(t - 1, 24),
                            breaker_max_cooldown,
                        )
                        s = 0
                if s > 0 or t > 0 or q > rnd:
                    breaker[host] = (s, t, q)
                else:
                    breaker.pop(host, None)
        res.rounds.append({"round": rnd, "n_assigned": len(assignments), "n_new": n_new})
    return res
