import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_go_spark import schemas
from spider_go_spark.functions.urls import host_hash_col, url_hash_col
from spider_go_spark.operators.politeness import budget_cut, schedule_round


def _frontier(spark, rows):
    """rows: (url_norm, host, depth, priority, discovery_rank)"""
    pdf = pd.DataFrame(
        rows, columns=["url_norm", "host", "depth", "priority", "discovery_rank"]
    )
    pdf["url"] = pdf["url_norm"]
    pdf["parent_hash"] = None
    pdf["discovered_round"] = 0
    df = spark.createDataFrame(pdf)
    df = (
        df.withColumn("url_hash", url_hash_col("url_norm"))
        .withColumn("host_hash", host_hash_col("host"))
        .withColumn("depth", F.col("depth").cast("int"))
        .withColumn("discovered_round", F.col("discovered_round").cast("int"))
        .withColumn("parent_hash", F.col("parent_hash").cast("long"))
        .withColumn("discovery_rank", F.col("discovery_rank").cast("long"))
    )
    return df.select(*[f.name for f in schemas.FRONTIER.fields])


def _policy(spark, rows):
    return spark.createDataFrame(rows, schemas.HOST_POLICY)


def test_budget_respected_and_order(spark):
    rows = [(f"http://a.test/{i}", "a.test", 0, float(i % 3), i) for i in range(20)]
    frontier = _frontier(spark, rows)
    policy = _policy(spark, [("a.test", 0, 5, None, False, None)])
    out = schedule_round(frontier, policy).collect()
    assert len(out) == 5
    # the top-5 under (priority desc, round, discovery_rank, url_norm)
    expect = sorted(rows, key=lambda r: (-r[3], 0, r[4], r[0]))[:5]
    got = sorted(out, key=lambda r: r.host_rank)
    assert [r.url_norm for r in got] == [r[0] for r in expect]


def test_crawl_delay_reduces_budget(spark):
    rows = [(f"http://d.test/{i}", "d.test", 0, 1.0, i) for i in range(30)]
    frontier = _frontier(spark, rows)
    # delay 3000ms in a 10000ms round → at most 3 fetches
    policy = _policy(spark, [("d.test", 3000, 20, None, False, None)])
    out = schedule_round(frontier, policy, round_budget_ms=10_000).collect()
    assert len(out) == 3
    assert sorted(r.scheduled_offset_ms for r in out) == [0, 3000, 6000]


def test_disabled_and_robots_filters(spark):
    rows = [
        ("http://x.test/ok", "x.test", 0, 1.0, 1),
        ("http://x.test/private/a", "x.test", 0, 1.0, 2),
        ("http://dead.test/a", "dead.test", 0, 1.0, 3),
        ("http://free.test/a", "free.test", 0, 1.0, 4),  # no policy row
    ]
    frontier = _frontier(spark, rows)
    policy = _policy(
        spark,
        [
            ("x.test", 0, 10, "User-agent: *\nDisallow: /private\n", False, None),
            ("dead.test", 0, 10, None, True, None),
        ],
    )
    got = sorted(r.url_norm for r in schedule_round(frontier, policy).collect())
    assert got == ["http://free.test/a", "http://x.test/ok"]


@pytest.mark.parametrize("salt_n", [1, 4, 64])
def test_salting_does_not_change_result(spark, salt_n):
    # one hot host with many rows + several cold hosts
    rows = [(f"http://hot.test/{i:04d}", "hot.test", 0, float(i % 5), i) for i in range(200)]
    rows += [(f"http://c{j}.test/{i}", f"c{j}.test", 0, 1.0, i) for j in range(5) for i in range(8)]
    frontier = _frontier(spark, rows)
    policy = _policy(spark, [("hot.test", 0, 7, None, False, None)])
    out = schedule_round(frontier, policy, salt_n=salt_n)
    got = sorted((r.url_norm, r.host_rank) for r in out.collect())
    # reference: unsalted single-phase cut
    base = schedule_round(frontier, policy, salt_n=1)
    expect = sorted((r.url_norm, r.host_rank) for r in base.collect())
    assert got == expect
    hot = [u for u, _ in got if u.startswith("http://hot")]
    assert len(hot) == 7
