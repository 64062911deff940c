"""Per-host failure circuit breaker: a host accumulating
``breaker_threshold`` consecutive failed fetches is quarantined — excluded
from scheduling, frontier rows untouched — with an exponentially growing
cooldown per trip, fully reset by any successful fetch. Engine
(plans/round_loop.py breaker table + quarantine anti-join) must reproduce
the pure-Python oracle's ordering and seen set under failure injection, the
quarantine gap pattern must actually be exponential, and a crash mid-
quarantine must resume bit-identically."""

from __future__ import annotations

import pytest

from spider_go_spark.oracle.pyoracle import crawl_oracle
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

N_URLS = 250
N_HOSTS = 5
MAX_ROUNDS = 10
DEAD = ("h2.example.test",)


def _cfg(workdir: str, **over) -> CrawlConfig:
    base = dict(
        workdir=workdir,
        n_urls=N_URLS,
        n_hosts=N_HOSTS,
        num_shards=4,
        default_budget=6,
        max_rounds=MAX_ROUNDS,
        breaker_threshold=4,
        breaker_cooldown_rounds=1,
        breaker_max_cooldown=8,
        dead_hosts=DEAD,
    )
    base.update(over)
    return CrawlConfig(**base)


def _fetch_digest(engine: CrawlEngine):
    return sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )


@pytest.fixture(scope="module")
def breaker_outputs(spark, tmp_path_factory):
    seeds_df = make_seeds(spark, 30, N_URLS, N_HOSTS)
    engine = CrawlEngine(spark, _cfg(str(tmp_path_factory.mktemp("breaker"))))
    engine.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)
    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    oracle = crawl_oracle(
        seeds, {}, N_URLS, N_HOSTS, default_budget=6, max_rounds=MAX_ROUNDS,
        breaker_threshold=4, breaker_cooldown_rounds=1,
        breaker_max_cooldown=8, dead_hosts=DEAD,
    )
    return engine, oracle


def test_breaker_ordering_matches_oracle(breaker_outputs):
    engine, oracle = breaker_outputs
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"])
        for d in oracle.fetched
    )
    assert _fetch_digest(engine) == expect


def test_breaker_seen_matches_oracle(breaker_outputs):
    engine, oracle = breaker_outputs
    got = {r.url_norm for r in engine.seen_urls.read().select("url_norm").collect()}
    assert got == oracle.seen


def test_quarantine_gaps_grow_exponentially(breaker_outputs):
    engine, _ = breaker_outputs
    rounds = sorted(
        {
            r["round"]
            for r in engine.fetched_docs.read()
            .filter(f"host = '{DEAD[0]}'")
            .select("round")
            .collect()
        }
    )
    # the dead host is probed in bursts; gaps between fetch rounds must be
    # non-decreasing (exponential cooldown, capped) and a real quarantine
    # (gap > 1) must occur at least once
    assert len(rounds) >= 2, rounds
    gaps = [b - a for a, b in zip(rounds, rounds[1:])]
    assert all(b >= a for a, b in zip(gaps, gaps[1:])), (rounds, gaps)
    assert max(gaps) > 1, (rounds, gaps)
    # healthy hosts are never starved: every crawl round fetched something
    # from a non-dead host while the frontier had eligible rows
    all_rounds = {
        r["round"]
        for r in engine.fetched_docs.read()
        .filter(f"host <> '{DEAD[0]}'")
        .select("round")
        .collect()
    }
    assert all_rounds  # the quarantine never blocked the rest of the crawl


def test_breaker_state_has_no_healthy_rows(breaker_outputs):
    engine, _ = breaker_outputs
    hosts = {
        r["host"] for r in engine.breaker.read().select("host").collect()
    }
    assert hosts <= set(DEAD), hosts


def test_breaker_resume_bit_identical(spark, tmp_path_factory):
    seeds_df = make_seeds(spark, 30, N_URLS, N_HOSTS)
    w_full = str(tmp_path_factory.mktemp("brk-full"))
    full = CrawlEngine(spark, _cfg(w_full))
    full.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)

    w_res = str(tmp_path_factory.mktemp("brk-res"))
    first = CrawlEngine(spark, _cfg(w_res))
    # stop mid-crawl, inside the quarantine window the full run shows
    first.crawl(seeds=seeds_df, max_rounds=3)
    second = CrawlEngine(spark, _cfg(w_res))
    second.crawl(max_rounds=MAX_ROUNDS)  # resume from checkpoint, no seeds
    assert _fetch_digest(second) == _fetch_digest(full)
    got_state = sorted(
        (r["host"], r["streak"], r["trips"], r["quarantined_until"])
        for r in second.breaker.read().collect()
    )
    want_state = sorted(
        (r["host"], r["streak"], r["trips"], r["quarantined_until"])
        for r in full.breaker.read().collect()
    )
    assert got_state == want_state


def test_breaker_off_keeps_historical_fingerprint(tmp_path_factory):
    w = str(tmp_path_factory.mktemp("brk-fp"))
    on = _cfg(w)
    off = CrawlConfig(
        workdir=w, n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4,
        default_budget=6, max_rounds=MAX_ROUNDS,
    )
    assert on.fingerprint() != off.fingerprint()
    # a default config's fingerprint carries no breaker parts (pre-breaker
    # checkpoints stay resumable): enabling ONLY the breaker must be a
    # strict suffix extension of the default fingerprint
    assert on.fingerprint().startswith(off.fingerprint())
