"""Hot/cold frontier tiering: per-round scheduling over the hot tier only
must be bit-identical to full-frontier scheduling (the tier is a cost
optimization, never a semantic change), and non-rebalance rounds must not
touch cold buckets (the O(frontier) work happens only at rebalances)."""

import hashlib

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_go_spark.functions.urls import url_hash_col
from spider_go_spark.operators.politeness import frontier_order, tier_split
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds


def _frontier_df(spark, n=400, hosts=7):
    pdf = pd.DataFrame(
        {
            "url_norm": [f"http://h{i % hosts}.test/p/{i}" for i in range(n)],
            "host": [f"h{i % hosts}.test" for i in range(n)],
            "priority": [(i * 37) % 5 for i in range(n)],
            "discovered_round": [i % 3 for i in range(n)],
            "discovery_rank": [(i * 13) % 97 for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf).withColumn("url_hash", url_hash_col("url_norm"))


def test_tier_split_is_per_host_top_h(spark):
    H = 10
    df = _frontier_df(spark)
    tiered = tier_split(df, H, salt_n=4)
    # reference: plain (unsalted) per-host row_number
    w = Window.partitionBy("host").orderBy(*frontier_order())
    ref = df.withColumn("__rk", F.row_number().over(w))
    ref_hot = {r.url_norm for r in ref.filter(F.col("__rk") <= H).collect()}
    got_hot = {r.url_norm for r in tiered.filter(F.col("__tier") == 0).collect()}
    got_cold = {r.url_norm for r in tiered.filter(F.col("__tier") == 1).collect()}
    assert got_hot == ref_hot
    assert len(got_hot) + len(got_cold) == df.count()
    assert not (got_hot & got_cold)
    # no extra/lost columns beyond the __tier tag
    assert sorted(tiered.columns) == sorted(df.columns + ["__tier"])


def _digest(eng):
    rows = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in eng.fetched_docs.read().collect()
    )
    return len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def _run(spark, workdir, **overrides):
    cfg = CrawlConfig(
        workdir=workdir, n_urls=150, n_hosts=5, num_shards=4, max_rounds=3,
        **overrides,
    )
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=3)
    return eng


def test_tiered_crawl_bit_identical_to_untiered(spark, tmp_path):
    """THE exactness gate: same crawl, hot_tier_rounds=2 (small enough to
    force real cold demotion and a mid-crawl rebalance) vs untiered —
    fetched-docs digests and seen sets must be identical."""
    base = _run(spark, str(tmp_path / "flat"))
    tiered = _run(spark, str(tmp_path / "tiered"), hot_tier_rounds=2)
    assert _digest(tiered) == _digest(base)
    seen = lambda e: {r.url_norm for r in e.seen_urls.read().collect()}
    assert seen(tiered) == seen(base)
    # the tiered run really did maintain a cold tier at some point
    B = tiered.cfg.frontier_buckets
    had_cold = any(
        any(int(b) >= B for b in (tiered.frontier.snapshot(s).bucket_dirs or {}))
        for s in tiered.frontier.snapshot_ids()
    )
    assert had_cold, "hot tier never overflowed — test not exercising tiering"


def test_non_rebalance_rounds_leave_cold_buckets_untouched(spark, tmp_path):
    """Between rebalances, round commits may rewrite HOT buckets only: a
    snapshot whose new dirs are round commits must carry every cold
    bucket's dirs unchanged (the per-round cost is O(hot), physically)."""
    eng = _run(spark, str(tmp_path / "t"), hot_tier_rounds=2)
    B = eng.cfg.frontier_buckets
    sids = eng.frontier.snapshot_ids()
    checked = 0
    for a, b in zip(sids, sids[1:]):
        sa, sb = eng.frontier.snapshot(a), eng.frontier.snapshot(b)
        new_dirs = set(sb.data_dirs) - set(sa.data_dirs)
        if any("rebalance-" in d for d in new_dirs):
            continue  # the amortized O(frontier) pass may move anything
        cold_a = {k: v for k, v in (sa.bucket_dirs or {}).items() if k >= B}
        cold_b = {k: v for k, v in (sb.bucket_dirs or {}).items() if k >= B}
        assert cold_a == cold_b, f"round commit {a}->{b} rewrote cold buckets"
        checked += 1
    assert checked > 0, "no non-rebalance commits to audit"


def test_tiered_crawl_with_policy_budgets(spark, tmp_path):
    """Tiering under a real host policy (varying max_in_flight sizes the
    guard prefix off the policy max): still bit-identical to untiered."""
    from spider_go_spark import schemas

    def policy(spark):
        return spark.createDataFrame(
            [
                ("h0.example.test", 0, 3, None, False, None),
                ("h1.example.test", 0, 1, None, False, None),
                ("h2.example.test", 0, 7, None, False, None),
            ],
            schemas.HOST_POLICY,
        )

    def run(workdir, **ov):
        cfg = CrawlConfig(
            workdir=workdir, n_urls=150, n_hosts=5, num_shards=4,
            max_rounds=4, **ov,
        )
        eng = CrawlEngine(spark, cfg, host_policy=policy(spark))
        eng.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=4)
        return eng

    base = run(str(tmp_path / "flat"))
    tiered = run(str(tmp_path / "tiered"), hot_tier_rounds=2)
    assert _digest(tiered) == _digest(base)


def test_tiered_resume_bit_identical(spark, tmp_path):
    """Crash after round 2 of a tiered crawl, resume, finish: digest equals
    the uninterrupted tiered run (rebalance scheduling is a pure function
    of the round number, so resume re-derives it)."""
    full = _run(spark, str(tmp_path / "full"), hot_tier_rounds=2)
    cfg = CrawlConfig(
        workdir=str(tmp_path / "interrupted"), n_urls=150, n_hosts=5,
        num_shards=4, max_rounds=3, hot_tier_rounds=2,
    )
    eng1 = CrawlEngine(spark, cfg)
    eng1.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=2)
    eng2 = CrawlEngine(spark, cfg)  # fresh engine ≙ fresh process
    eng2.crawl(max_rounds=3)
    assert _digest(eng2) == _digest(full)
