"""Checkpoint/resume: a run killed after round k and resumed must be
bit-identical to an uninterrupted run (north rule)."""

from pyspark.sql import functions as F

from spider_go_spark import schemas
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

N_URLS = 200
N_HOSTS = 5
MAX_ROUNDS = 4


def _cfg(workdir):
    return CrawlConfig(
        workdir=str(workdir), n_urls=N_URLS, n_hosts=N_HOSTS, num_shards=4, max_rounds=MAX_ROUNDS
    )


def _table_contents(engine):
    fetched = sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"], str(r["spans"]))
        for r in engine.fetched_docs.read().collect()
    )
    seen = sorted(
        (r.url_norm, r.shard_id, r.seen_round) for r in engine.seen_urls.read().collect()
    )
    frontier = sorted(
        (r.url_norm, r.priority, r.depth, r.discovered_round, r.discovery_rank)
        for r in engine.frontier.read().collect()
    )
    lineage = sorted(
        (r.url_norm, r.parent_hash, r["round"], r.rank_in_round)
        for r in engine.lineage.read().collect()
    )
    shards = sorted(
        (r.shard_id, bytes(r.bloom_bits).hex(), r.n_items)
        for r in engine.seen_shards.read().collect()
    )
    return fetched, seen, frontier, lineage, shards


def test_resume_bit_identical(spark, tmp_path):
    seeds = make_seeds(spark, 25, N_URLS, N_HOSTS)

    # uninterrupted run
    full = CrawlEngine(spark, _cfg(tmp_path / "full"))
    full.crawl(seeds=seeds, max_rounds=MAX_ROUNDS)

    # interrupted run: rounds 0..2, then a NEW engine resumes from checkpoint
    part = CrawlEngine(spark, _cfg(tmp_path / "part"))
    part.crawl(seeds=seeds, max_rounds=2)
    resumed = CrawlEngine(spark, _cfg(tmp_path / "part"))
    resumed.crawl(max_rounds=MAX_ROUNDS)  # no seeds: must restore from checkpoint

    assert _table_contents(full) == _table_contents(resumed)


def test_resume_discards_uncommitted_partial_state(spark, tmp_path):
    """Simulate a crash mid-round: tables have extra uncommitted snapshots
    beyond the last round_state — resume must roll them back."""
    seeds = make_seeds(spark, 25, N_URLS, N_HOSTS)
    eng = CrawlEngine(spark, _cfg(tmp_path / "crash"))
    eng.crawl(seeds=seeds, max_rounds=2)

    # fake a partial round-3: append garbage to fetched_docs without a
    # round_state commit (≙ dying between table writes)
    garbage = eng.fetched_docs.read().limit(1).withColumn("round", F.lit(99))
    eng.fetched_docs.append(garbage, "partial-garbage")
    assert eng.fetched_docs.read().filter("round = 99").count() == 1

    resumed = CrawlEngine(spark, _cfg(tmp_path / "crash"))
    resumed.crawl(max_rounds=MAX_ROUNDS)
    assert resumed.fetched_docs.read().filter("round = 99").count() == 0

    # and the final state matches an uninterrupted run
    full = CrawlEngine(spark, _cfg(tmp_path / "full2"))
    full.crawl(seeds=seeds, max_rounds=MAX_ROUNDS)
    assert _table_contents(full) == _table_contents(resumed)


def test_resume_refuses_changed_config(spark, tmp_path):
    """Resuming under a semantically different CrawlConfig must fail loudly
    (silent divergence / Bloom-geometry corruption otherwise)."""
    import pytest
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    wd = str(tmp_path / "cfg-guard")
    cfg = CrawlConfig(workdir=wd, n_urls=150, n_hosts=5, num_shards=4, max_rounds=2)
    CrawlEngine(spark, cfg).crawl(seeds=make_seeds(spark, 10, 150, 5), max_rounds=1)

    changed = CrawlConfig(workdir=wd, n_urls=150, n_hosts=5, num_shards=8, max_rounds=2)
    with pytest.raises(ValueError, match="refusing to resume"):
        CrawlEngine(spark, changed).crawl(max_rounds=2)

    # unchanged config still resumes
    same = CrawlConfig(workdir=wd, n_urls=150, n_hosts=5, num_shards=4, max_rounds=2)
    CrawlEngine(spark, same).crawl(max_rounds=2)
