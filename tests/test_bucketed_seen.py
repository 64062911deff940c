"""Shard-bucketed seen set: the exact-verify anti-join must physically
prune to the shards with Bloom positives, and per-round seen commits must
append into buckets without rewriting earlier rounds' data dirs (the
append analogue of the frontier's overwrite-by-partition-filter audit)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_go_spark.functions.urls import url_hash_col
from spider_go_spark.operators.seen import (
    bloom_params,
    build_shard_updates,
    filter_unseen,
    shard_id_col,
)
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds

NUM_SHARDS = 8


def _urls_df(spark, urls):
    pdf = pd.DataFrame({"url_norm": urls})
    return spark.createDataFrame(pdf).withColumn("url_hash", url_hash_col("url_norm"))


def test_verify_join_requests_only_positive_shards(spark):
    """filter_unseen with a read-callable must ask for exactly the distinct
    shard ids of the Bloom positives — never the whole shard range — and
    still return the exact unseen set."""
    m_bits, k = bloom_params(2000, NUM_SHARDS)
    seen_list = [f"http://s.test/{i}" for i in range(300)]
    seen_df = _urls_df(spark, seen_list).withColumn(
        "shard_id", shard_id_col("url_hash", NUM_SHARDS)
    )
    shards = build_shard_updates(seen_df, NUM_SHARDS, m_bits, k)
    cands = _urls_df(
        spark, seen_list[:120] + [f"http://n.test/{i}" for i in range(120)]
    ).persist()

    requested: list[list[int]] = []

    def read_seen(shard_ids):
        requested.append(sorted(int(s) for s in shard_ids))
        return seen_df.filter(F.col("shard_id").isin([int(s) for s in shard_ids]))

    out = filter_unseen(
        cands, shards, read_seen, NUM_SHARDS, m_bits=m_bits, k_hashes=k
    )
    got = sorted(r.url_norm for r in out.collect())
    assert got == sorted(f"http://n.test/{i}" for i in range(120))

    # the callable ran exactly once, with the positives' shard set
    assert len(requested) == 1
    tagged = cands.withColumn("shard_id", shard_id_col("url_hash", NUM_SHARDS))
    # true duplicates are guaranteed Bloom-positive (no false negatives),
    # so their shards are a lower bound; the full shard range is the upper
    dup_shards = {
        r["shard_id"]
        for r in tagged.filter(F.col("url_norm").startswith("http://s.test/"))
        .select("shard_id")
        .distinct()
        .collect()
    }
    assert set(requested[0]) >= dup_shards
    assert set(requested[0]) <= set(range(NUM_SHARDS))
    out.unpersist()
    cands.unpersist()


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    cfg = CrawlConfig(
        workdir=str(tmp_path_factory.mktemp("seenbuckets") / "crawl"),
        n_urls=150,
        n_hosts=5,
        num_shards=4,
        max_rounds=3,
    )
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=3)
    return eng


def test_seen_commits_are_bucket_scoped_appends(crawled):
    """Across consecutive seen_urls snapshots of a real crawl, every data
    dir of snapshot N is still present in snapshot N+1 (append-only: no
    round rewrote earlier shard dirs), the manifests carry a shard_id
    bucket mapping, and bucket_rows sums to the table row count."""
    eng = crawled
    sids = eng.seen_urls.snapshot_ids()
    assert len(sids) >= 3
    for a, b in zip(sids, sids[1:]):
        dirs_a = set(eng.seen_urls.snapshot(a).data_dirs)
        dirs_b = set(eng.seen_urls.snapshot(b).data_dirs)
        assert dirs_a <= dirs_b, "a seen commit rewrote earlier shard dirs"
    snap = eng.seen_urls.snapshot()
    assert snap.bucket_dirs, "seen_urls manifest lost its bucket mapping"
    assert set(snap.bucket_dirs) <= set(range(eng.cfg.num_shards))
    assert sum(snap.bucket_rows.values()) == snap.row_count


def test_seen_bucket_reads_match_full_read(crawled):
    """read_buckets over every shard ≡ read(); each single-shard read
    returns only rows whose shard_id is that shard (physical pruning is
    value-correct, not just dir-count-correct)."""
    eng = crawled
    all_rows = {
        (r.url_norm, r.shard_id) for r in eng.seen_urls.read().collect()
    }
    via_buckets = set()
    for s in range(eng.cfg.num_shards):
        rows = eng.seen_urls.read_buckets([s]).collect()
        assert all(r.shard_id == s for r in rows)
        via_buckets |= {(r.url_norm, r.shard_id) for r in rows}
    assert via_buckets == all_rows


def test_seen_dedup_invariant_still_holds(crawled):
    """The engine-level dedup contract is unchanged by the storage change:
    fetched docs are unique by url_norm and seen = fetched + frontier."""
    eng = crawled
    fetched = eng.fetched_docs.read()
    assert fetched.count() == fetched.select("url_norm").distinct().count()
    assert (
        eng.seen_urls.read().count()
        == fetched.count() + eng.frontier.read().count()
    )
