import pandas as pd
from pyspark.sql import functions as F

from spider_go_spark.operators.ranking import global_rank


def test_global_rank_matches_total_order(spark):
    pdf = pd.DataFrame(
        {
            "k": [f"k{i:05d}" for i in range(1000)],
            "v": [(i * 37) % 1000 for i in range(1000)],
        }
    )
    df = spark.createDataFrame(pdf)
    ranked = global_rank(df, [F.col("v").asc(), F.col("k").asc()], rank_col="r")
    rows = ranked.collect()
    assert len(rows) == 1000
    assert sorted(r.r for r in rows) == list(range(1, 1001))
    by_rank = sorted(rows, key=lambda r: r.r)
    keys = [(r.v, r.k) for r in by_rank]
    assert keys == sorted(keys)


def test_global_rank_deterministic_across_partitionings(spark):
    pdf = pd.DataFrame({"k": [f"x{i}" for i in range(500)], "v": [i % 7 for i in range(500)]})
    a = global_rank(spark.createDataFrame(pdf).repartition(3), [F.col("v"), F.col("k")], "r")
    b = global_rank(spark.createDataFrame(pdf).repartition(11), [F.col("v"), F.col("k")], "r")
    assert sorted((r.k, r.r) for r in a.collect()) == sorted((r.k, r.r) for r in b.collect())


def test_global_rank_empty(spark):
    df = spark.createDataFrame([], "k string, v long")
    assert global_rank(df, [F.col("v")], "r").count() == 0
