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
