"""Partition-scoped frontier maintenance: bucket-level commits must leave
untouched buckets' data dirs byte-identical (never re-read, never
re-written) — the Iceberg overwrite-by-partition-filter model."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds
from spider_go_spark.tables.snapshot import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("v", T.StringType(), False),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "__bucket", F.pmod(F.col("url_hash"), F.lit(4)).cast("int")
    )


def test_replace_buckets_carries_untouched_dirs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), SCHEMA)
    t.replace_buckets(_df(spark, [(0, "a"), (1, "b"), (2, "c")]), [0, 1, 2], "r0")
    s0 = t.snapshot()
    assert set(s0.bucket_dirs) == {0, 1, 2}
    assert s0.row_count == 3 and s0.bucket_rows == {0: 1, 1: 1, 2: 1}

    # rewrite ONLY bucket 1 (replace its row, add another); 0 and 2 carry
    t.replace_buckets(_df(spark, [(1, "b2"), (5, "b3")]), [1], "r1")
    s1 = t.snapshot()
    assert s1.bucket_dirs[0] == s0.bucket_dirs[0]  # identical dir strings:
    assert s1.bucket_dirs[2] == s0.bucket_dirs[2]  # untouched ⇒ not rewritten
    assert s1.bucket_dirs[1] != s0.bucket_dirs[1]
    assert s1.row_count == 4 and s1.bucket_rows[1] == 2

    got = sorted((r.url_hash, r.v) for r in t.read().collect())
    assert got == [(0, "a"), (1, "b2"), (2, "c"), (5, "b3")]
    # pruned read touches only the requested bucket
    assert sorted(r.v for r in t.read_buckets([1]).collect()) == ["b2", "b3"]

    # a touched bucket with no surviving rows disappears from the mapping
    t.replace_buckets(_df(spark, []), [2], "r2")
    assert 2 not in t.snapshot().bucket_dirs
    assert sorted(r.v for r in t.read().collect()) == ["a", "b2", "b3"]


def test_replace_buckets_rejects_stray_rows(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t2"), SCHEMA)
    with pytest.raises(RuntimeError, match="undeclared buckets"):
        t.replace_buckets(_df(spark, [(0, "a"), (1, "b")]), [0], "r0")


def test_expire_keeps_live_bucket_parents(spark, tmp_path):
    """Retention must not delete a parent data dir whose bucket subdirs are
    still referenced by a kept snapshot."""
    t = SnapshotTable(spark, str(tmp_path / "t3"), SCHEMA)
    t.replace_buckets(_df(spark, [(0, "a"), (1, "b")]), [0, 1], "r0")
    for i in range(1, 4):  # bucket 1 rewritten thrice; bucket 0 only in r0
        t.replace_buckets(_df(spark, [(1, f"b{i}")]), [1], f"r{i}")
    t.expire_snapshots(keep_last=1)
    got = sorted(r.v for r in t.read().collect())
    assert got == ["a", "b3"]  # bucket 0's r0 parent dir survived expiry


def test_crawl_rounds_do_not_rewrite_untouched_buckets(spark, tmp_path):
    """Engine-level audit: across consecutive frontier snapshots of a real
    crawl, buckets outside the round's assigned/new sets keep their exact
    data dirs (the round never rewrote the whole frontier)."""
    cfg = CrawlConfig(
        workdir=str(tmp_path / "crawl"),
        n_urls=150,
        n_hosts=5,
        num_shards=4,
        frontier_buckets=64,
        max_rounds=3,
    )
    eng = CrawlEngine(spark, cfg)
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=3)

    sids = eng.frontier.snapshot_ids()
    assert len(sids) >= 3
    carried_any = False
    for a, b in zip(sids, sids[1:]):
        bd_a = eng.frontier.snapshot(a).bucket_dirs or {}
        bd_b = eng.frontier.snapshot(b).bucket_dirs or {}
        shared = [k for k in bd_a if k in bd_b and bd_a[k] == bd_b[k]]
        carried_any = carried_any or bool(shared)
    assert carried_any, "every round rewrote every bucket — pruning is not happening"
    # and the committed manifests' dirs all exist on disk
    for d in eng.frontier.snapshot().data_dirs:
        assert os.path.isdir(os.path.join(eng.frontier.path, d))
