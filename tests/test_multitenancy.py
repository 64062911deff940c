"""Multi-tenancy: two crawl_ids sharing one catalog must behave exactly as
if each ran in its own catalog (row-scoped isolation, ≙ the reference's
per-workflow Mongo scoping, storage_workflow_mongodb.go:213-222), and
drop_crawl must cascade-delete exactly one tenant's state (≙ DeleteFlow,
storage_workflow_mongodb.go:560-609)."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds


def _cfg(workdir, crawl_id, n_urls):
    return CrawlConfig(
        workdir=str(workdir), crawl_id=crawl_id, n_urls=n_urls, n_hosts=5,
        num_shards=4, max_rounds=4,
    )


def _fetch_log(engine, cid):
    return sorted(
        (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
        for r in engine.fetched_docs.read()
        .filter(F.col("crawl_id") == cid)
        .select("round", "fetch_rank", "url_norm", "status")
        .collect()
    )


def _seen(engine, cid):
    return {
        r.url_norm
        for r in engine.seen_urls.read().filter(F.col("crawl_id") == cid).collect()
    }


def test_interleaved_crawls_isolated_and_scoped_delete(spark, tmp_path):
    seeds_a = make_seeds(spark, 20, 150, 5)
    seeds_b = make_seeds(spark, 10, 200, 5)

    # reference runs: each crawl alone in its own catalog
    iso_a = CrawlEngine(spark, _cfg(tmp_path / "iso_a", "a", 150))
    iso_a.crawl(seeds=seeds_a, max_rounds=2)
    iso_b = CrawlEngine(spark, _cfg(tmp_path / "iso_b", "b", 200))
    iso_b.crawl(seeds=seeds_b, max_rounds=2)

    # interleaved in ONE shared catalog: a rounds 0-1, b rounds 0-2,
    # then a RESUMES (across the interleaved b commits) through round 2
    shared = tmp_path / "shared"
    a1 = CrawlEngine(spark, _cfg(shared, "a", 150))
    a1.crawl(seeds=seeds_a, max_rounds=1)
    b1 = CrawlEngine(spark, _cfg(shared, "b", 200))
    b1.crawl(seeds=seeds_b, max_rounds=2)
    a2 = CrawlEngine(spark, _cfg(shared, "a", 150))
    a2.crawl(max_rounds=2)  # resume from a's checkpoint, no seeds

    assert _fetch_log(a2, "a") == _fetch_log(iso_a, "a")
    assert _fetch_log(a2, "b") == _fetch_log(iso_b, "b")
    assert _seen(a2, "a") == _seen(iso_a, "a")
    assert _seen(a2, "b") == _seen(iso_b, "b")

    # scoped cascade delete of b: every b row leaves every table; a intact
    before_a = (
        _fetch_log(a2, "a"),
        _seen(a2, "a"),
        sorted(r.url_norm for r in a2.frontier.read().filter("crawl_id = 'a'").collect()),
    )
    b2 = CrawlEngine(spark, _cfg(shared, "b", 200))
    b2.drop_crawl()
    for name, t in b2._tables().items():
        assert t.read().filter("crawl_id = 'b'").count() == 0, name
    a3 = CrawlEngine(spark, _cfg(shared, "a", 150))
    assert (
        _fetch_log(a3, "a"),
        _seen(a3, "a"),
        sorted(r.url_norm for r in a3.frontier.read().filter("crawl_id = 'a'").collect()),
    ) == before_a

    # a still resumes and crawls past the drop commit; dropped b is fresh
    a3.crawl(max_rounds=3)
    assert len(_fetch_log(a3, "a")) >= len(before_a[0])
    with pytest.raises(ValueError, match="no checkpoint"):
        CrawlEngine(spark, _cfg(shared, "b", 200)).crawl(max_rounds=2)


def test_catalog_pins_frontier_buckets(spark, tmp_path):
    wd = tmp_path / "pin"
    CrawlEngine(spark, CrawlConfig(workdir=str(wd), frontier_buckets=16))
    with pytest.raises(ValueError, match="catalog property"):
        CrawlEngine(spark, CrawlConfig(workdir=str(wd), frontier_buckets=32))
