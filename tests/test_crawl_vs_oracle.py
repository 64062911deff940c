"""End-to-end oracle replay: the Spark engine must reproduce the pure-Python
oracle's crawl ordering and URL-seen membership under the same seed list +
politeness budget (BASELINE.json north_rule)."""

import pandas as pd
import pytest

from spider_go_spark import schemas
from spider_go_spark.oracle.pyoracle import crawl_oracle
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

N_URLS = 300
N_HOSTS = 6
MAX_ROUNDS = 4


@pytest.fixture(scope="module")
def policy_rows():
    return [
        ("hot.example.test", 0, 5, None, False, None),
        ("h1.example.test", 2000, 10, None, False, None),  # delay → budget 5
        ("h2.example.test", 0, 10, "User-agent: *\nDisallow: /p/1\n", False, None),
        ("h3.example.test", 0, 10, None, True, None),  # disabled
    ]


@pytest.fixture(scope="module")
def crawl_outputs(spark, tmp_path_factory, policy_rows):
    seeds_df = make_seeds(spark, 40, N_URLS, N_HOSTS)
    policy_df = spark.createDataFrame(policy_rows, schemas.HOST_POLICY)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("crawl")),
        n_urls=N_URLS,
        n_hosts=N_HOSTS,
        num_shards=4,
        default_budget=10,
        max_rounds=MAX_ROUNDS,
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    history = engine.crawl(seeds=seeds_df, max_rounds=MAX_ROUNDS)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv,
        }
        for h, d, m, r, x, rv in policy_rows
    }
    oracle = crawl_oracle(
        seeds, policy, N_URLS, N_HOSTS, default_budget=10, max_rounds=MAX_ROUNDS
    )
    return engine, history, oracle


def test_fetch_ordering_matches_oracle(crawl_outputs):
    engine, _, oracle = crawl_outputs
    got = [
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    ]
    got.sort()
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"], d["status"]) for d in oracle.fetched
    )
    assert got == expect


def test_seen_membership_matches_oracle(crawl_outputs):
    engine, _, oracle = crawl_outputs
    got = {r.url_norm for r in engine.seen_urls.read().select("url_norm").collect()}
    assert got == oracle.seen


def test_no_url_fetched_twice(crawl_outputs):
    engine, _, _ = crawl_outputs
    df = engine.fetched_docs.read()
    assert df.count() == df.select("url_norm").distinct().count()


def test_per_host_budget_invariant(crawl_outputs):
    engine, _, _ = crawl_outputs
    from pyspark.sql import functions as F

    per = (
        engine.fetched_docs.read()
        .groupBy("round", "host")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    budgets = {
        "hot.example.test": 5,
        "h1.example.test": 5,  # min(10, 10000//2000)
        "h2.example.test": 10,
        "h3.example.test": 0,
    }
    for r in per:
        assert r.n <= budgets.get(r.host, 10), (r.host, r.n)


def test_span_sequence_equality(crawl_outputs):
    """Per-row invariant vs the reference: span-sequence equality
    (kind, text, media_ref, order) against the synthetic source."""
    import numpy as np

    from spider_go_spark.sources.webgraph import node_id_of_url, spans_of_nodes

    engine, _, _ = crawl_outputs
    rows = (
        engine.fetched_docs.read()
        .filter("status = '200'")
        .select("url_norm", "spans")
        .collect()
    )
    assert rows
    for r in rows[:50]:
        node = int(node_id_of_url(pd.Series([r.url_norm])).iloc[0])
        expect = spans_of_nodes(np.array([node]), N_URLS, N_HOSTS)[0]
        got = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in r.spans
        ]
        assert got == expect, r.url_norm


def test_lineage_covers_seen(crawl_outputs):
    engine, _, _ = crawl_outputs
    lineage = {r.url_norm for r in engine.lineage.read().select("url_norm").collect()}
    seen = {r.url_norm for r in engine.seen_urls.read().select("url_norm").collect()}
    assert lineage == seen


def test_fetch_passthrough_columns(spark):
    """synthetic_fetch passthrough: parent scheduling fields ride through
    the Arrow fetch unchanged (what lets link extraction skip the join
    back to the assignment set), while the doc columns are unaffected."""
    import pandas as pd

    from spider_go_spark.functions.urls import url_hash_col
    from spider_go_spark.sources.webgraph import canonical_urls, synthetic_fetch

    import numpy as np

    urls = [str(u) for u in canonical_urls(np.arange(20), N_HOSTS)]
    pdf = pd.DataFrame(
        {
            "url": urls,
            "url_norm": urls,
            "host": [u.split("/")[2] for u in urls],
            "round": [1] * 20,
            "fetch_rank": list(range(20)),
            "priority": [float(i % 3) for i in range(20)],
            "depth": [i % 4 for i in range(20)],
        }
    )
    asg = spark.createDataFrame(pdf).withColumn("url_hash", url_hash_col("url_norm"))
    plain = synthetic_fetch(asg, N_URLS, N_HOSTS)
    passed = synthetic_fetch(asg, N_URLS, N_HOSTS, passthrough=("priority", "depth"))
    assert set(passed.columns) == set(plain.columns) | {"priority", "depth"}
    got = {r.fetch_rank: (r.priority, r.depth) for r in passed.collect()}
    assert got == {i: (float(i % 3), i % 4) for i in range(20)}
    # doc columns identical with and without passthrough
    a = sorted(map(tuple, plain.select("doc_id", "url_norm", "status").collect()))
    b = sorted(map(tuple, passed.select("doc_id", "url_norm", "status").collect()))
    assert a == b


def test_max_depth_caps_frontier(spark, tmp_path_factory):
    """max_depth=1 with unbounded budget fetches exactly the seeds plus the
    seeds' direct links (the depth-filtered slice of the unlimited crawl),
    and the crawl terminates on its own when every candidate is over-deep."""
    seeds_df = make_seeds(spark, 15, 200, 4)

    cfg_all = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("nodepth")),
        n_urls=200, n_hosts=4, num_shards=4,
        default_budget=100_000, max_rounds=3,
    )
    eng_all = CrawlEngine(spark, cfg_all)
    eng_all.crawl(seeds=seeds_df, max_rounds=3)
    # with an unbounded budget nothing is ever deferred, so a URL's fetch
    # round is its discovery depth + 1 (round 0 only injects seeds)
    docs_all = eng_all.fetched_docs.read().select("url_norm", "round").collect()

    cfg_cap = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("depth1")),
        n_urls=200, n_hosts=4, num_shards=4,
        default_budget=100_000, max_rounds=6,  # extra rounds: must self-stop
        max_depth=1,
    )
    eng_cap = CrawlEngine(spark, cfg_cap)
    history = eng_cap.crawl(seeds=seeds_df, max_rounds=6)
    docs_cap = eng_cap.fetched_docs.read().select("url_norm", "round").collect()

    assert max(r["round"] for r in docs_cap) <= 2  # depth ≤ 1 ⇒ round ≤ 2
    # the capped fetch set is exactly the unlimited run's depth ≤ 1 slice
    expected = {r["url_norm"] for r in docs_all if r["round"] <= 2}
    assert {r["url_norm"] for r in docs_cap} == expected
    # terminated by frontier exhaustion, not by the round limit
    assert len(history) < 6


def test_agent_groups_and_robots_crawl_delay_match_oracle(spark, tmp_path_factory):
    """RFC 9309 end-to-end: the engine crawls as a NAMED agent; hosts carry
    robots bodies with named-agent groups (case/version-insensitive) and a
    group Crawl-delay that must tighten the per-round budget exactly like
    the oracle's pure-Python scheduler."""
    n_urls, n_hosts, rounds = 160, 4, 3
    agent = "SpiderBot/1.0"
    robots_named = (
        "User-agent: spiderbot\nDisallow: /p/1\nCrawl-delay: 2\n\n"
        "User-agent: *\nDisallow: /\n"  # wildcard would kill the host; must NOT apply
    )
    robots_delay_only = "User-agent: *\nCrawl-delay: 4\n"  # budget 10000//4000=2
    policy_rows = [
        ("hot.example.test", 0, 8, robots_named, False, None),
        ("h1.example.test", 1000, 8, robots_delay_only, False, None),  # robots stricter
        ("h2.example.test", 5000, 8, robots_delay_only, False, None),  # policy stricter
    ]
    seeds_df = make_seeds(spark, 30, n_urls, n_hosts)
    policy_df = spark.createDataFrame(policy_rows, schemas.HOST_POLICY)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("agent_crawl")),
        n_urls=n_urls,
        n_hosts=n_hosts,
        num_shards=4,
        default_budget=8,
        max_rounds=rounds,
        user_agent=agent,
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    engine.crawl(seeds=seeds_df, max_rounds=rounds)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv,
        }
        for h, d, m, r, x, rv in policy_rows
    }
    oracle = crawl_oracle(
        seeds, policy, n_urls, n_hosts, default_budget=8, max_rounds=rounds,
        user_agent=agent,
    )
    got = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm").collect()
    )
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"]) for d in oracle.fetched
    )
    assert got == expect
    # the named-agent host must have fetched (wildcard Disallow:/ ignored) …
    hosts = {u.split("/")[2] for _, _, u in got}
    assert "hot.example.test" in hosts
    # … and the robots Crawl-delay tightened budgets: ≤2 fetches/round on h1
    from collections import Counter

    per_round = Counter((r, u.split("/")[2]) for r, _, u in got)
    assert all(c <= 2 for (rr, h), c in per_round.items() if h == "h1.example.test")


def test_robots_sitemap_seeds_match_oracle(spark, tmp_path_factory):
    """Sitemap autodiscovery: robots ``Sitemap:`` URLs become round-0 seeds
    (at the configured priority) in both the engine and the oracle; a URL
    reachable ONLY via a sitemap must get fetched."""
    n_urls, n_hosts, rounds = 120, 4, 2
    sm_url = "http://h1.example.test/p/119"  # canonical form; not in the seed list
    robots = (
        "User-agent: *\nDisallow: /nothing\n"
        f"Sitemap: {sm_url}\nSitemap: {sm_url}  # dup dedups away\n"
    )
    policy_rows = [("h1.example.test", 0, 10, robots, False, None)]
    seeds_df = make_seeds(spark, 15, n_urls, n_hosts)
    policy_df = spark.createDataFrame(policy_rows, schemas.HOST_POLICY)
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("sm_crawl")),
        n_urls=n_urls,
        n_hosts=n_hosts,
        num_shards=4,
        max_rounds=rounds,
        ingest_robots_sitemaps=True,
        sitemap_seed_priority=3.0,  # above every synthetic seed priority tie
    )
    engine = CrawlEngine(spark, cfg, policy_df)
    engine.crawl(seeds=seeds_df, max_rounds=rounds)

    seeds = [(r.url, r.priority) for r in seeds_df.collect()]
    policy = {
        h: {
            "crawl_delay_ms": d, "max_in_flight": m, "robots_txt": r,
            "disabled": x, "revisit_after_rounds": rv,
        }
        for h, d, m, r, x, rv in policy_rows
    }
    oracle = crawl_oracle(
        seeds, policy, n_urls, n_hosts, max_rounds=rounds,
        ingest_robots_sitemaps=True, sitemap_seed_priority=3.0,
    )
    got = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"])
        for r in engine.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm").collect()
    )
    expect = sorted(
        (d["round"], d["fetch_rank"], d["url_norm"]) for d in oracle.fetched
    )
    assert got == expect
    assert sm_url in {u for _, _, u in got}
