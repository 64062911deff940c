"""Sketch-operator invariants: HLL accuracy + partition invariance, CMS
one-sided error, and sampling determinism. Cross-engine value parity is the
driver gate's job (queries/sketchops oracles); these tests pin the
algorithmic guarantees the oracles can't express."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.operators import sketches

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_within_error_bound(spark, events):
    est = {
        r["event_type"]: r["hll_est"]
        for r in sketches.hll_estimate(events, "user_id", ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        # raw HLL with m=64: ~13% std error; 4 sigma bound, generous on
        # the low-cardinality side where raw HLL biases high
        assert est[t] == pytest.approx(n, rel=0.55), (t, est[t], n)


def test_hll_partition_invariant(spark, events):
    a = sketches.hll_estimate(events, "user_id", ["event_type"])
    b = sketches.hll_estimate(events.repartition(13), "user_id", ["event_type"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_one_sided_and_tight_for_heavy(spark, events):
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(10)
    est = sketches.cms_estimates(events, "user_id", top.select("user_id"))
    rows = top.join(est, "user_id").collect()
    assert len(rows) == 10
    total = events.count()
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"]  # never underestimates
        # standard CMS bound: err <= e*N/w with prob 1-e^-d; be loose
        assert r["cms_est"] - r["exact_cnt"] <= 4 * total / sketches.CMS_W


def test_sketch_queries_partition_invariant(spark):
    from spider_go_spark.queries import sketchops

    for name in (
        "tfidf_top_terms",
        "repetition_quality",
        "stratified_sample",
        "histogram_quantiles",
    ):
        df = sketchops.QUERIES[name](spark, SF)
        once = sorted(map(tuple, df.collect()))
        again = sorted(map(tuple, df.repartition(7).collect()))
        assert once == again, name
