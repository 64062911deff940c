"""Table maintenance: snapshot compaction (flat + bucketed), the engine
maintain() service, and the drop_crawl/revisit bucketing interaction —
compaction must change file layout only, never content, ordering, or
resume semantics."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_go_spark import schemas
from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
from spider_go_spark.sources.webgraph import make_seeds
from spider_go_spark.tables.snapshot import Catalog

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_compact_flat_table(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t", SCHEMA)
    for i in range(5):
        t.append(_df(spark, [(i, f"v{i}")]), f"b{i}")
    before = sorted(map(tuple, t.read().collect()))
    pre = t.data_file_stats()
    assert pre["n_data_dirs"] == 5
    s = t.compact(target_partitions=1)
    post = t.data_file_stats()
    assert post["n_data_dirs"] == 1 and post["n_files"] == 1
    assert sorted(map(tuple, t.read().collect())) == before
    assert s.properties["compacted_from_snapshot"] == pre["snapshot_id"]
    # time travel to the pre-compaction snapshot still works until expiry
    assert t.read(pre["snapshot_id"]).count() == 5


def test_compact_refuses_row_drift(spark, tmp_path, monkeypatch):
    t = Catalog(spark, str(tmp_path)).load("t", SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b")]), "b0")
    orig = t._write_data
    # simulate a rewrite that silently lost a row (observed count drifts)
    monkeypatch.setattr(
        t,
        "_write_data",
        lambda df, label, partition_by=None: (orig(df, label, partition_by)[0], 1),
    )
    with pytest.raises(RuntimeError, match="row drift"):
        t.compact()


def test_compact_bucketed_table(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t", SCHEMA)
    df = _df(spark, [(i, f"v{i}") for i in range(20)]).withColumn(
        "__bucket", F.pmod("k", F.lit(4)).cast("int")
    )
    t.replace_buckets(df, touched=[0, 1, 2, 3], label="b0")
    before = sorted(map(tuple, t.read().collect()))
    snap = t.compact()
    assert sorted(map(tuple, t.read().collect())) == before
    assert set(snap.bucket_dirs) == {0, 1, 2, 3}
    assert sum(snap.bucket_rows.values()) == 20


def test_engine_maintain_compacts_and_resume_is_bit_identical(spark, tmp_path):
    def fetch_log(e):
        return sorted(
            (r["round"], r["fetch_rank"], r["url_norm"], r["status"])
            for r in e.fetched_docs.read().collect()
        )

    cfg = dict(n_urls=150, n_hosts=5, num_shards=4, max_rounds=4)
    # reference: uninterrupted 4-round crawl, no maintenance
    ref = CrawlEngine(spark, CrawlConfig(workdir=str(tmp_path / "ref"), **cfg))
    ref.crawl(seeds=make_seeds(spark, 20, 150, 5))

    # maintained run: 2 rounds, compact, then resume to 4 rounds
    e1 = CrawlEngine(spark, CrawlConfig(workdir=str(tmp_path / "m"), **cfg))
    e1.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=2)
    dirs_before = e1.fetched_docs.data_file_stats()["n_data_dirs"]
    compacted = e1.maintain(min_dirs=2)
    assert "fetched_docs" in compacted
    assert e1.fetched_docs.data_file_stats()["n_data_dirs"] == 1
    assert dirs_before > 1
    # bucketed tables are never compacted (one dir per bucket already)
    assert "frontier" not in compacted

    e2 = CrawlEngine(spark, CrawlConfig(workdir=str(tmp_path / "m"), **cfg))
    e2.crawl(max_rounds=4)  # resume over the maintain commit
    assert fetch_log(e2) == fetch_log(ref)


def test_drop_crawl_keeps_revisit_bucketing_for_other_tenants(spark, tmp_path):
    policy = spark.createDataFrame(
        [("h0.example.test", 0, 8, None, False, 2),
         ("h1.example.test", 0, 8, None, False, 2),
         ("h2.example.test", 0, 8, None, False, None),
         ("h3.example.test", 0, 8, None, False, None),
         ("h4.example.test", 0, 8, None, False, None)],
        schemas.HOST_POLICY,
    )
    wd = str(tmp_path / "shared")
    a = CrawlEngine(
        spark,
        CrawlConfig(workdir=wd, crawl_id="a", n_urls=150, n_hosts=5, num_shards=4),
        policy,
    )
    a.crawl(seeds=make_seeds(spark, 15, 150, 5), max_rounds=2)
    b = CrawlEngine(
        spark,
        CrawlConfig(workdir=wd, crawl_id="b", n_urls=200, n_hosts=5, num_shards=4),
        policy,
    )
    b.crawl(seeds=make_seeds(spark, 10, 200, 5), max_rounds=2)
    assert b.revisit.snapshot().row_count > 0

    b.drop_crawl()
    # the revisit queue must still be a bucketed table after the scoped
    # delete — crawl a's next rounds do partition-scoped revisit rewrites
    assert a.revisit.snapshot().bucket_dirs is not None or a.revisit.snapshot().empty
    a2 = CrawlEngine(
        spark,
        CrawlConfig(workdir=wd, crawl_id="a", n_urls=150, n_hosts=5, num_shards=4),
        policy,
    )
    a2.crawl(max_rounds=5)  # revisit rounds proceed; would RuntimeError before fix
    assert a2.fetched_docs.read().filter("crawl_id = 'b'").count() == 0
    assert a2.fetched_docs.read().filter("round >= 2").count() > 0


def test_thousand_round_append_keeps_manifest_bounded(spark, tmp_path):
    """r4 verdict task #5: bucket-scoped appends grow the manifest's
    bucket_dirs lists one entry per (round, bucket) — O(rounds·buckets)
    JSON that the driver reads/rewrites on EVERY commit. With the
    per-round compact_buckets fold (cost ∝ overgrown buckets only), a
    1,000-round append loop must keep the CURRENT manifest under a pinned
    byte bound and every bucket chain under min_dirs, while content stays
    exactly the appended multiset (layout-only change)."""
    import json

    N_ROUNDS, N_BUCKETS, MIN_DIRS = 1000, 4, 8
    t = Catalog(spark, str(tmp_path)).load("t", SCHEMA)
    dfs = [
        spark.createDataFrame([(b, "v")], SCHEMA)
        .withColumn("__bucket", F.lit(b).cast("int"))
        .localCheckpoint(eager=True)
        for b in range(N_BUCKETS)
    ]
    max_manifest = max_chain = 0
    for rnd in range(N_ROUNDS):
        b = rnd % N_BUCKETS
        t.append_buckets(dfs[b], touched=[b], label=f"r{rnd}")
        t.compact_buckets(min_dirs=MIN_DIRS)
        if rnd % 100 == 99:
            t.expire_snapshots(keep_last=3)
        snap = t.snapshot()
        max_chain = max(max_chain, max(len(d) for d in snap.bucket_dirs.values()))
        max_manifest = max(
            max_manifest, os.path.getsize(t._manifest_path(snap.snapshot_id))
        )
    # manifest bounded at O(buckets · min_dirs), NOT O(rounds · buckets):
    # 4 buckets × ≤8 dirs ≈ 2.2 KB observed; 1000 unfolded rounds would be
    # ~45 bytes × 1000 dirs ≈ 45 KB and growing
    assert max_manifest <= 4096, max_manifest
    assert max_chain <= MIN_DIRS, max_chain
    snap = t.snapshot()
    assert snap.row_count == N_ROUNDS
    # content is exactly the appended multiset (folds never drop/dup rows)
    per_bucket = {
        r["k"]: r["n"]
        for r in t.read().groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_bucket == {b: N_ROUNDS // N_BUCKETS for b in range(N_BUCKETS)}
    # manifest JSON is well-formed and carries the bounded mapping
    with open(t._manifest_path(snap.snapshot_id)) as fh:
        m = json.load(fh)
    assert sum(len(v) for v in m["bucket_dirs"].values()) <= N_BUCKETS * MIN_DIRS
