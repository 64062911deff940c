import pandas as pd
from pyspark.sql import functions as F

from spider_go_spark.functions.urls import url_hash_col
from spider_go_spark.operators.seen import (
    bloom_maybe_seen,
    bloom_params,
    build_shard_updates,
    filter_unseen,
    merge_shards,
    shard_id_col,
)

NUM_SHARDS = 4


def _urls_df(spark, urls):
    pdf = pd.DataFrame({"url_norm": urls})
    return spark.createDataFrame(pdf).withColumn("url_hash", url_hash_col("url_norm"))


def test_bloom_no_false_negatives(spark):
    m_bits, k = bloom_params(1000, NUM_SHARDS)
    urls = [f"http://h{i % 7}.test/p/{i}" for i in range(500)]
    inserted = _urls_df(spark, urls)
    shards = build_shard_updates(inserted, NUM_SHARDS, m_bits, k)
    tagged = bloom_maybe_seen(inserted, shards, NUM_SHARDS)
    # every inserted URL must be flagged maybe_seen (no false negatives)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fp_rate_reasonable(spark):
    m_bits, k = bloom_params(2000, NUM_SHARDS)
    inserted = _urls_df(spark, [f"http://a.test/p/{i}" for i in range(1000)])
    probes = _urls_df(spark, [f"http://b.test/q/{i}" for i in range(1000)])
    shards = build_shard_updates(inserted, NUM_SHARDS, m_bits, k)
    fp = bloom_maybe_seen(probes, shards, NUM_SHARDS).filter(F.col("maybe_seen")).count()
    assert fp < 100  # ~1% design point; generous bound


def test_merge_shards(spark):
    m_bits, k = bloom_params(1000, NUM_SHARDS)
    a = _urls_df(spark, [f"http://a.test/{i}" for i in range(100)])
    b = _urls_df(spark, [f"http://b.test/{i}" for i in range(100)])
    sa = build_shard_updates(a, NUM_SHARDS, m_bits, k)
    sb = build_shard_updates(b, NUM_SHARDS, m_bits, k)
    merged = merge_shards(sa, sb)
    both = a.unionByName(b)
    assert bloom_maybe_seen(both, merged, NUM_SHARDS).filter(~F.col("maybe_seen")).count() == 0
    assert merged.count() <= NUM_SHARDS
    assert merged.agg(F.sum("n_items")).first()[0] == 200


def test_filter_unseen_exact(spark):
    m_bits, k = bloom_params(1000, NUM_SHARDS)
    seen_urls_list = [f"http://s.test/{i}" for i in range(200)]
    seen_df = _urls_df(spark, seen_urls_list).withColumn(
        "shard_id", shard_id_col("url_hash", NUM_SHARDS)
    )
    shards = build_shard_updates(seen_df, NUM_SHARDS, m_bits, k)
    # candidates: half already seen, half new
    cands = _urls_df(spark, seen_urls_list[:100] + [f"http://n.test/{i}" for i in range(100)])
    out = filter_unseen(cands, shards, seen_df, NUM_SHARDS)
    got = sorted(r.url_norm for r in out.collect())
    assert got == sorted(f"http://n.test/{i}" for i in range(100))


def test_filter_unseen_broadcast_equals_cogroup(spark):
    """The tiered probe's two arms (map-side broadcast bitmaps vs cogrouped
    shard shuffle) must be EXACTLY interchangeable — same rows, same
    columns — since the engine switches on bitmap size alone."""
    m_bits, k = bloom_params(1000, NUM_SHARDS)
    seen_urls_list = [f"http://s.test/{i}" for i in range(300)]
    seen_df = _urls_df(spark, seen_urls_list).withColumn(
        "shard_id", shard_id_col("url_hash", NUM_SHARDS)
    )
    shards = build_shard_updates(seen_df, NUM_SHARDS, m_bits, k)
    cands = _urls_df(spark, seen_urls_list[:150] + [f"http://n.test/{i}" for i in range(150)])
    via_cogroup = filter_unseen(cands, shards, seen_df, NUM_SHARDS)
    via_broadcast = filter_unseen(
        cands, shards, seen_df, NUM_SHARDS, m_bits=m_bits, k_hashes=k
    )
    # a cap smaller than the bitmaps forces the cogroup arm even with
    # geometry supplied
    via_forced_cogroup = filter_unseen(
        cands, shards, seen_df, NUM_SHARDS,
        m_bits=m_bits, k_hashes=k, broadcast_cap_bytes=1,
    )
    rows = lambda df: sorted(map(tuple, df.select(sorted(df.columns)).collect()))
    assert sorted(via_cogroup.columns) == sorted(via_broadcast.columns)
    assert rows(via_cogroup) == rows(via_broadcast) == rows(via_forced_cogroup)
    for df in (via_cogroup, via_broadcast, via_forced_cogroup):
        df.unpersist()


def test_filter_unseen_broadcast_empty_shards(spark):
    """Broadcast arm with NO shard rows yet (round 0): everything probes
    unseen, nothing crashes on the all-zeros bitmap."""
    m_bits, k = bloom_params(1000, NUM_SHARDS)
    cands = _urls_df(spark, [f"http://n.test/{i}" for i in range(50)])
    empty_shards = build_shard_updates(cands.limit(0), NUM_SHARDS, m_bits, k)
    empty_seen = cands.limit(0).withColumn(
        "shard_id", shard_id_col("url_hash", NUM_SHARDS)
    )
    out = filter_unseen(
        cands, empty_shards, empty_seen, NUM_SHARDS, m_bits=m_bits, k_hashes=k
    )
    assert out.count() == 50
    out.unpersist()
