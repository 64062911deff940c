import os

from pyspark.sql import types as T

from spider_go_spark.tables.snapshot import Catalog

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_and_read(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t1", SCHEMA)
    assert t.read().count() == 0
    t.append(_df(spark, [(1, "a"), (2, "b")]), "batch1")
    t.append(_df(spark, [(3, "c")]), "batch2")
    assert t.read().count() == 3
    assert t.snapshot().row_count == 3


def test_time_travel_and_overwrite(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t2", SCHEMA)
    s0 = t.append(_df(spark, [(1, "a")]), "b1")
    s1 = t.append(_df(spark, [(2, "b")]), "b2")
    t.overwrite(_df(spark, [(9, "z")]), "b3")
    assert t.read().count() == 1
    assert t.read(s0.snapshot_id).count() == 1
    assert t.read(s1.snapshot_id).count() == 2
    assert sorted(r.k for r in t.read(s1.snapshot_id).collect()) == [1, 2]


def test_rollback(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t3", SCHEMA)
    s0 = t.append(_df(spark, [(1, "a")]), "b1")
    t.append(_df(spark, [(2, "b")]), "b2")
    t.rollback_to(s0.snapshot_id)
    assert t.current_snapshot_id() == s0.snapshot_id
    assert t.read().count() == 1


def test_atomic_commit_leaves_no_partial_manifest(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t4", SCHEMA)
    t.append(_df(spark, [(1, "a")]), "b1")
    mdir = os.path.join(t.path, "_manifests")
    assert all(not n.endswith(".tmp") for n in os.listdir(mdir))


def test_incremental_read_appends_only(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t6", SCHEMA)
    s0 = t.append(_df(spark, [(1, "a"), (2, "b")]), "b0")
    s1 = t.append(_df(spark, [(3, "c")]), "b1")
    s2 = t.append(_df(spark, [(4, "d"), (5, "e")]), "b2")
    # delta (s0, s2]: exactly the rows of the two later commits
    assert sorted(r.k for r in t.read_incremental(s0.snapshot_id).collect()) == [3, 4, 5]
    # bounded delta (s0, s1]
    assert sorted(
        r.k for r in t.read_incremental(s0.snapshot_id, s1.snapshot_id).collect()
    ) == [3]
    # from the beginning = full content; empty range = no rows
    assert t.read_incremental(-1).count() == 5
    assert t.read_incremental(s2.snapshot_id).count() == 0
    # history metadata table matches the commit sequence
    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [0, 1, 2]
    assert [h["row_count"] for h in hist] == [2, 3, 5]


def test_incremental_read_rejects_rewrites(spark, tmp_path):
    import pytest

    t = Catalog(spark, str(tmp_path)).load("t7", SCHEMA)
    s0 = t.append(_df(spark, [(1, "a")]), "b0")
    t.append(_df(spark, [(2, "b")]), "b1")
    t.compact(target_partitions=1)  # rewrite commit in the range
    with pytest.raises(ValueError, match="not an append commit"):
        t.read_incremental(s0.snapshot_id)
    # an expired starting snapshot is also a full-scan signal, not silence
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not retained"):
        t.read_incremental(s0.snapshot_id)


def test_incremental_read_consumes_crawl_rounds(spark, tmp_path):
    """The pull-side twin of docs_sink: a consumer that remembers the last
    snapshot id it saw reads exactly each round's newly fetched docs."""
    from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine
    from spider_go_spark.sources.webgraph import make_seeds

    eng = CrawlEngine(
        spark,
        CrawlConfig(workdir=str(tmp_path / "w"), n_urls=150, n_hosts=5, num_shards=4),
    )
    eng.crawl(seeds=make_seeds(spark, 20, 150, 5), max_rounds=2)
    mark = eng.fetched_docs.current_snapshot_id()
    before = eng.fetched_docs.snapshot().row_count
    last_round = eng.fetched_docs.read().agg({"round": "max"}).collect()[0][0]
    eng.crawl(max_rounds=3)
    delta = eng.fetched_docs.read_incremental(mark)
    total = eng.fetched_docs.read()
    assert delta.count() == total.count() - before > 0
    assert sorted(r.url_norm for r in delta.collect()) == sorted(
        r.url_norm for r in total.filter(total["round"] > last_round).collect()
    )


def test_expire_snapshots(spark, tmp_path):
    t = Catalog(spark, str(tmp_path)).load("t5", SCHEMA)
    for i in range(5):
        t.append(_df(spark, [(i, "x")]), f"b{i}")
    t.expire_snapshots(keep_last=2)
    assert len(t.snapshot_ids()) == 2
    assert t.read().count() == 5  # latest snapshot sees all appended data
    # dropped data dirs for snapshots no longer referenced: all dirs still
    # referenced by the latest snapshot here, so nothing data-wise is lost
    t.overwrite(_df(spark, [(99, "y")]), "only")
    t.expire_snapshots(keep_last=1)
    assert t.read().count() == 1
    data_dirs = os.listdir(os.path.join(t.path, "data"))
    assert len(data_dirs) == 1 and data_dirs[0].startswith("only")


def test_schema_evolution_add_column(spark, tmp_path):
    """Widening the table schema (add-column, the Iceberg evolution case)
    keeps every OLD snapshot readable: files written under the narrow
    schema surface the new columns as NULL — both in full reads and in
    time-travel reads — and new appends mix freely with old data dirs.
    (Engine-level compat gates — e.g. the crawl's config fingerprint —
    are a separate, deliberate layer on top of this mechanical one.)"""
    cat = Catalog(spark, str(tmp_path))
    t = cat.load("evo", SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b")]), "old-batch")
    old_snap = t.current_snapshot_id()

    wide = T.StructType(
        [*SCHEMA.fields, T.StructField("w", T.IntegerType(), True)]
    )
    t2 = cat.load("evo", wide)  # same table dir, evolved schema
    rows = {(r["k"], r["v"], r["w"]) for r in t2.read().collect()}
    assert rows == {(1, "a", None), (2, "b", None)}

    t2.append(
        spark.createDataFrame([(3, "c", 7)], wide), "new-batch"
    )
    rows = {(r["k"], r["v"], r["w"]) for r in t2.read().collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 7)}
    # time travel to the pre-evolution snapshot still works under the
    # widened schema
    assert {
        (r["k"], r["v"], r["w"]) for r in t2.read(old_snap).collect()
    } == {(1, "a", None), (2, "b", None)}


def test_concurrent_commit_cas_single_winner(spark, tmp_path):
    """Two table handles on one root: a writer committing against a stale
    head must raise ConcurrentCommitError and leave the winner's manifest
    untouched — the single-writer contract is enforced, not assumed."""
    from unittest import mock

    import pytest

    from spider_go_spark.tables.snapshot import ConcurrentCommitError

    cat = Catalog(spark, str(tmp_path))
    t1 = cat.load("cas", SCHEMA)
    t2 = cat.load("cas", SCHEMA)
    t1.append(_df(spark, [(1, "a")]), "b1")  # v0

    stale = t2._next_snapshot_id()  # both writers derive 1 from head 0
    s1 = t1.append(_df(spark, [(2, "b")]), "b2")  # t1 wins v1
    assert s1.snapshot_id == stale
    with mock.patch.object(t2, "_next_snapshot_id", return_value=stale):
        with pytest.raises(ConcurrentCommitError, match="single-writer"):
            t2.append(_df(spark, [(9, "z")]), "intruder")

    # winner's manifest intact; loser left no tmp and no new snapshot
    assert t1.current_snapshot_id() == s1.snapshot_id
    assert sorted(r.k for r in t1.read().collect()) == [1, 2]
    mdir = os.path.join(t1.path, "_manifests")
    assert all(".tmp" not in n for n in os.listdir(mdir))

    # the losing handle recovers by recomputing the head
    t2.append(_df(spark, [(3, "c")]), "b3")
    assert sorted(r.k for r in t1.read().collect()) == [1, 2, 3]
