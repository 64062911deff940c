"""Crawl-engine end-to-end queries (rows-only checks).

These drive the actual frontier/politeness/seen/fetch machinery, which is
not expressible in ANSI SQL (multi-round iterative state) — the driver
records rows-only checks here; the pytest oracle-replay suite
(tests/test_crawl_vs_oracle.py) is the strict correctness gate for these
semantics, asserting ordering + seen-set equality against a pure-Python
simulator of spider-go's scheduler.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def crawl_fetch_ordering(spark: SparkSession, sf: str) -> DataFrame:
    """Full 3-round crawl of the deterministic synthetic graph (150 URLs,
    5 hosts, skewed hot host): returns the fetch log in scheduler order.
    Deterministic across runs/partitionings (tested at local[2] vs
    local[8])."""
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    workdir = tempfile.mkdtemp(prefix="crawlq-", dir=os.environ.get("TMPDIR", "/tmp"))
    cfg = CrawlConfig(workdir=workdir, n_urls=150, n_hosts=5, num_shards=4, max_rounds=3)
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, cfg.n_urls, cfg.n_hosts))
    return (
        eng.fetched_docs.read()
        .select("round", "fetch_rank", "url_norm", "host", "status")
        .orderBy("round", "fetch_rank")
    )


def crawl_frontier_lineage(spark: SparkSession, sf: str) -> DataFrame:
    """Same crawl; returns per-URL lineage (url, parent, discovery round) —
    the reference's session-context accumulation
    (storage_workflow_mongodb.go:751-757) as a table."""
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    workdir = tempfile.mkdtemp(prefix="crawlq-", dir=os.environ.get("TMPDIR", "/tmp"))
    cfg = CrawlConfig(workdir=workdir, n_urls=150, n_hosts=5, num_shards=4, max_rounds=3)
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, cfg.n_urls, cfg.n_hosts))
    return (
        eng.lineage.read()
        .select("url_norm", "parent_hash", "round")
        .orderBy("round", "url_norm")
        .withColumn("parent_hash", F.coalesce(F.col("parent_hash"), F.lit(0)))
    )


QUERIES = {
    "crawl_fetch_ordering": crawl_fetch_ordering,
    "crawl_frontier_lineage": crawl_frontier_lineage,
}

# Non-SQL-expressible (iterative, stateful): no oracle entries → rows-only.
ORACLES: dict[str, str] = {}
