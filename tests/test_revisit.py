"""Revisit/recrawl scheduling (≙ the reference's cron trigger re-firing
work on an interval, /root/reference/cmd/cron-trigger/main.go:82-229): a
fetched URL on a host with revisit_after_rounds = k is refetched k rounds
later, in the same deterministic scheduler order the pure-Python oracle
produces; config changes are picked up at round boundaries via a classified
full-outer policy diff."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark import schemas
from spider_go_spark.oracle.pyoracle import crawl_oracle
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

N_URLS = 120
N_HOSTS = 4
MAX_ROUNDS = 6

POLICY_ROWS = [
    # hot host refetched every 2 rounds; h1 throttled, never refetched;
    # h2 refetched every 3 rounds
    ("hot.example.test", 0, 4, None, False, 2),
    ("h1.example.test", 2000, 10, None, False, None),
    ("h2.example.test", 0, 6, None, False, 3),
]


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    seeds_df = make_seeds(spark, 15, N_URLS, N_HOSTS)
    policy_df = spark.createDataFrame(POLICY_ROWS, schemas.HOST_POLICY)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("revisit")),
        n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4, max_rounds=MAX_ROUNDS,
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    engine.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv,
        }
        for h, d, m, r, x, rv in POLICY_ROWS
    }
    oracle = crawl_oracle(seeds, policy, N_URLS, N_HOSTS, max_rounds=MAX_ROUNDS)
    return engine, oracle


def test_refetch_ordering_matches_oracle(outputs):
    engine, oracle = outputs
    got = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"]) for d in oracle.fetched
    )
    assert got == expect


def test_urls_actually_refetched(outputs):
    engine, _ = outputs
    per_url = (
        engine.fetched_docs.read()
        .filter(F.col("host") == "hot.example.test")
        .groupBy("url_norm")
        .agg(F.count("*").alias("n"), F.countDistinct("round").alias("n_rounds"))
        .collect()
    )
    assert per_url and max(r.n for r in per_url) >= 2  # refetch happened
    for r in per_url:
        assert r.n == r.n_rounds  # at most once per round, always


def test_no_revisit_host_never_refetched(outputs):
    engine, _ = outputs
    per_url = (
        engine.fetched_docs.read()
        .filter(F.col("host") == "h1.example.test")
        .groupBy("url_norm")
        .count()
        .collect()
    )
    assert per_url and all(r["count"] == 1 for r in per_url)


def test_revisit_survives_resume(spark, tmp_path):
    """Kill between rounds; the resumed engine must produce the identical
    fetch log incl. refetches (the revisit queue is checkpointed state)."""
    seeds = make_seeds(spark, 15, N_URLS, N_HOSTS)
    policy = spark.createDataFrame(POLICY_ROWS, schemas.HOST_POLICY)

    def log(e):
        return sorted(
            (r["round"], r["fetch_rank"], r["url_norm"])
            for r in e.fetched_docs.read().select("round", "fetch_rank", "url_norm").collect()
        )

    cfg_full = CrawlConfig(workdir=str(tmp_path / "full"), n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4)
    full = CrawlEngine(spark, cfg_full, policy)
    full.crawl(seeds=seeds, max_rounds=5)

    cfg_part = CrawlConfig(workdir=str(tmp_path / "part"), n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4)
    CrawlEngine(spark, cfg_part, policy).crawl(seeds=seeds, max_rounds=3)
    resumed = CrawlEngine(spark, cfg_part, policy)
    resumed.crawl(max_rounds=5)
    assert log(full) == log(resumed)


def test_update_policy_diff_classification(spark, tmp_path):
    """≙ cron-trigger config poll + diff: added/removed/changed/unchanged."""
    old = spark.createDataFrame(
        [
            ("a.test", 0, 5, None, False, None),
            ("b.test", 100, 5, None, False, 2),
            ("c.test", 0, 9, None, False, None),
        ],
        schemas.HOST_POLICY,
    )
    new = spark.createDataFrame(
        [
            ("a.test", 0, 5, None, False, None),   # unchanged
            ("b.test", 100, 5, None, False, 4),    # changed (revisit interval)
            ("d.test", 0, 3, None, True, None),    # added
        ],
        schemas.HOST_POLICY,
    )
    eng = CrawlEngine(spark, CrawlConfig(workdir=str(tmp_path / "pol")), old)
    v0 = eng.cfg.config_version
    diff = {r.host: r.change for r in eng.update_policy(new).collect()}
    assert diff == {
        "a.test": "unchanged", "b.test": "changed",
        "c.test": "removed", "d.test": "added",
    }
    assert eng.cfg.config_version == v0 + 1
    assert eng._has_revisit  # memo refreshed from the new policy


def test_change_rate_revisit_matches_mle(spark):
    """The Cho/Garcia-Molina estimator gate: rate_q20 equals the float
    MLE log2(n/(n-X)) within the log2 kernel's documented 2^-14 accuracy
    (= 64 q20 units), intervals stay clamped, and a host that changes
    more never gets a LONGER revisit interval."""
    import math

    from spider_go_spark.queries.crawlq import (
        PROBE_INTERVAL_ROUNDS,
        REVISIT_MAX_ROUNDS,
        REVISIT_MIN_ROUNDS,
        change_rate_revisit,
    )

    rows = change_rate_revisit(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_frac = []
    for r in rows:
        n, x = r["n_compared"], r["n_changed"]
        assert 0 <= x <= n
        want = math.log2(n / (n - min(x, n - 1)))
        assert abs(r["rate_q20"] - round(want * (1 << 20))) <= 64
        assert REVISIT_MIN_ROUNDS <= r["revisit_rounds"] <= REVISIT_MAX_ROUNDS
        if r["rate_q20"] > 0:
            # the interval is the clamped integer I/λ̂ (in log2 units)
            want_iv = (PROBE_INTERVAL_ROUNDS * (1 << 20)) // r["rate_q20"]
            assert r["revisit_rounds"] == max(
                REVISIT_MIN_ROUNDS, min(REVISIT_MAX_ROUNDS, want_iv)
            )
        by_frac.append((x / n if n else 0.0, r["revisit_rounds"]))
    by_frac.sort()
    ivs = [iv for _, iv in by_frac]
    assert all(a >= b for a, b in zip(ivs, ivs[1:]))  # more change, not longer
