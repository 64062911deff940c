"""Mid-crawl seed ingestion (webhook analogue): new seeds enter the
frontier as their own committed round; dedup against the seen set applies;
resume remains consistent."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.schemas import SEEDS
from spider_go_spark.sources.webgraph import canonical_urls, make_seeds
import numpy as np


@pytest.fixture()
def engine(spark, tmp_path):
    cfg = CrawlConfig(
        workdir=str(tmp_path / "crawl"), n_urls=150, n_hosts=5, num_shards=4, max_rounds=2
    )
    return CrawlEngine(spark, cfg)


def test_add_seeds_midcrawl(spark, engine):
    engine.crawl(seeds=make_seeds(spark, 10, 150, 5), max_rounds=2)
    seen_before = engine.seen_urls.read().count()
    frontier_before = engine.frontier.read().count()

    # one brand-new URL + one already-seen URL (dedups away)
    seen_url = engine.seen_urls.read().select("url_norm").first()["url_norm"]
    fresh = [str(u) for u in canonical_urls(np.array([149]), 5)]
    batch = spark.createDataFrame([(fresh[0], 9.0), (seen_url, 9.0)], SEEDS)
    m = engine.add_seeds(batch)

    assert m["seed_ingestion"] == 1
    assert m["n_candidates"] == 2
    new_expected = 1 if engine.seen_urls.read().filter(F.col("url_norm") == fresh[0]).count() else 0
    assert m["n_new"] in (0, 1)  # 0 iff the fresh URL was already crawled
    assert engine.seen_urls.read().count() == seen_before + m["n_new"]
    assert engine.frontier.read().count() == frontier_before + m["n_new"]

    # the ingestion consumed a round number and committed
    assert engine.state_log.last_round() == 3

    # continued crawl fetches the ingested URL with top priority
    hist = engine.crawl(max_rounds=4)
    if m["n_new"]:
        fetched = engine.fetched_docs.read().filter(F.col("url_norm") == fresh[0])
        assert fetched.count() == 1


def test_ingest_staged_roundtrip_and_drain(spark, engine, tmp_path):
    import os

    engine.crawl(seeds=make_seeds(spark, 10, 150, 5), max_rounds=1)
    staged_dir = str(tmp_path / "staged")
    fresh = [str(u) for u in canonical_urls(np.array([140, 141]), 5)]
    spark.createDataFrame(
        [(u, 5.0) for u in fresh], ["url_norm", "priority"]
    ).write.parquet(os.path.join(staged_dir, "batch_id=0"))
    m = engine.ingest_staged(staged_dir)
    assert m["n_candidates"] == 2
    assert m["n_batches_drained"] == 1
    # drained batches are deleted after the commit — the staging area stays
    # bounded and a second drain is a no-op, not a re-ingest of history
    assert not os.path.exists(os.path.join(staged_dir, "batch_id=0"))
    m2 = engine.ingest_staged(staged_dir)
    assert m2["n_candidates"] == 0


def test_docs_sink_exactly_once_across_resume(spark, tmp_path):
    """Pluggable per-round docs sink (≙ slack-worker): invoked once per
    committed fetch round; resume does NOT redeliver acked rounds, DOES
    deliver a committed round whose ack is missing (crash between commit
    and delivery)."""
    import os

    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine

    calls = []

    def sink(rnd, docs):
        calls.append((rnd, docs.count()))

    cfg = lambda: CrawlConfig(  # noqa: E731
        workdir=str(tmp_path / "sink"), n_urls=150, n_hosts=5, num_shards=4
    )
    eng = CrawlEngine(spark, cfg(), docs_sink=sink)
    eng.crawl(seeds=make_seeds(spark, 10, 150, 5), max_rounds=2)
    first = list(calls)
    assert [r for r, _ in first] == [1, 2]
    assert all(n > 0 for _, n in first)

    # resume with nothing new to fetch: acked rounds must not redeliver
    calls.clear()
    resumed = CrawlEngine(spark, cfg(), docs_sink=sink)
    resumed.crawl(max_rounds=2)
    assert calls == []

    # simulate dying between commit and delivery: drop round 2's ack
    os.remove(resumed._sink_ack_path(2))
    calls.clear()
    replay = CrawlEngine(spark, cfg(), docs_sink=sink)
    replay.crawl(max_rounds=2)
    assert [r for r, _ in calls] == [2]
    assert calls[0][1] == first[1][1]  # identical payload row count
