"""Property-based crawl invariants over randomized graphs (SURVEY.md §5.2
item 4). Graph shape is driven by seeded parameters; each case runs a full
crawl and checks the engine's global invariants.

Hypothesis drives the parameter choice but with a tight example budget —
each example is a full multi-round Spark crawl.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.plans.sizing import plan_sizing
from spider_go_spark.sources.webgraph import make_seeds


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    n_urls=st.sampled_from([60, 120, 200]),
    n_hosts=st.sampled_from([3, 7]),
    n_seeds=st.sampled_from([5, 15]),
    budget=st.sampled_from([2, 5]),
)
def test_crawl_invariants(spark, tmp_path_factory, n_urls, n_hosts, n_seeds, budget):
    wd = str(tmp_path_factory.mktemp("prop"))
    cfg = CrawlConfig(
        workdir=wd, n_urls=n_urls, n_hosts=n_hosts, num_shards=4,
        max_rounds=4, default_budget=budget,
    )
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, n_seeds, n_urls, n_hosts))

    fetched = eng.fetched_docs.read().persist()
    seen = eng.seen_urls.read().persist()
    frontier = eng.frontier.read().persist()
    lineage = eng.lineage.read().persist()

    # 1. no URL fetched twice, ever
    assert fetched.count() == fetched.select("url_norm").distinct().count()

    # 2. per-host per-round fetches ≤ budget
    over = (
        fetched.groupBy("round", "host").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > budget).count()
    )
    assert over == 0

    # 3. seen = fetched ∪ frontier (partition of the enqueued set)
    assert seen.count() == fetched.count() + frontier.count()
    assert frontier.join(fetched, "url_norm", "left_semi").count() == 0

    # 4. monotone seen growth: every fetched/frontier URL is in seen
    assert fetched.join(seen, "url_norm", "left_anti").count() == 0
    assert frontier.join(seen, "url_norm", "left_anti").count() == 0

    # 5. reachability: every non-seed lineage row's parent was fetched
    parents = lineage.filter(F.col("parent_hash").isNotNull()).select(
        F.col("parent_hash").alias("url_hash")
    ).distinct()
    unfetched_parents = parents.join(
        fetched.select("url_hash").distinct(), "url_hash", "left_anti"
    ).count()
    assert unfetched_parents == 0

    # 6. lineage covers exactly the seen set
    assert lineage.select("url_norm").distinct().count() == seen.count()

    # 7. fetch ranks are unique within a round, starting at 1
    dup_ranks = (
        fetched.groupBy("round", "fetch_rank").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).count()
    )
    assert dup_ranks == 0

    for df in (fetched, seen, frontier, lineage):
        df.unpersist()


def test_sizing_design_point():
    """The 10^10-URL design point produces explicit, sane parameters."""
    p = plan_sizing(10_000_000_000)
    assert p.shuffle_partitions == 14902  # 2 TB / 128 MiB
    assert p.bloom_m_bits_per_shard <= 16 * 8 * 2**20
    assert p.num_shards >= 10_000_000_000 * 10 // (16 * 8 * 2**20)
    assert p.salt_n >= 4
    # and the test scale stays small
    t = plan_sizing(10_000)
    assert t.shuffle_partitions == 8 and t.num_shards == 8
