"""Similarity-search operators: brute-force exactness vs numpy, LSH recall
and candidate-reduction properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from spider_go_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket,
    lsh_topk,
)

SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)
N, DIMS, K = 300, 64, 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    # clustered corpus: 10 centers + noise → LSH buckets carry real structure
    centers = rng.standard_normal((10, DIMS))
    vecs = centers[np.arange(N) % 10] + 0.3 * rng.standard_normal((N, DIMS))
    data = [(int(i), [float(x) for x in vecs[i].astype(np.float32)]) for i in range(N)]
    return spark.createDataFrame(data, SCHEMA), vecs


def numpy_topk(vecs: np.ndarray, qid: int, k: int) -> list[int]:
    q = vecs[qid]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted((i for i in range(len(vecs)) if i != qid), key=lambda i: (-sims[i], i))
    return order[:k]


def test_brute_force_matches_numpy(spark, corpus):
    sdf, vecs = corpus
    q = sdf.filter(F.col("vec_id") < 3)
    got = brute_force_topk(sdf, q, k=K)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in range(3):
        # float32→float64 near-ties can swap adjacent ranks; compare sets and
        # the top-1 (strict order is oracle-verified in the gate instead)
        expect = numpy_topk(vecs.astype(np.float64), qid, K)
        got_ids = [nid for _, nid in sorted(by_q[qid])]
        assert len(set(got_ids) & set(expect)) >= K - 1
        assert got_ids[0] == expect[0]


def test_lsh_recall_and_candidate_reduction(spark, corpus):
    sdf, vecs = corpus
    q = sdf.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(sdf, q, k=K).persist()
    approx = lsh_topk(sdf, q, k=K, planes=8).persist()

    # candidate reduction: same-bucket pools are far smaller than the corpus
    buckets = sdf.select(lsh_bucket(F.col("embedding")).alias("b"))
    sizes = [r["n"] for r in buckets.groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) < N // 2

    # recall@10 of the LSH path vs exact (clustered data, 8 planes)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q1] & ap.get(q1, set())) / len(ex[q1]) for q1 in ex]
    assert sum(recalls) / len(recalls) >= 0.5  # clustered corpus, single-probe
    exact.unpersist()
    approx.unpersist()


def test_lsh_topk_is_subset_of_bucketmates(spark, corpus):
    sdf, _ = corpus
    q = sdf.filter(F.col("vec_id") == 0)
    out = lsh_topk(sdf, q, k=K).collect()
    qb = sdf.filter(F.col("vec_id") == 0).select(
        lsh_bucket(F.col("embedding")).alias("b")
    ).first()["b"]
    mates = {
        r["vec_id"]
        for r in sdf.select("vec_id", lsh_bucket(F.col("embedding")).alias("b"))
        .filter(F.bit_count(F.col("b").bitwiseXOR(F.lit(qb))) <= 1)  # probe radius 1
        .collect()
    }
    assert all(r["neighbor_id"] in mates for r in out)


def test_ivf_recall_and_candidate_reduction(spark, corpus):
    """IVF inverted lists: recall vs exact on clustered data; candidates are
    restricted to the probed lists."""
    from spider_go_spark.operators.similarity import ivf_topk

    sdf, _ = corpus
    q = sdf.filter(F.col("vec_id") < 20)
    cent = sdf.filter(F.col("vec_id") % 30 == 0)  # 10 deterministic anchors
    exact = brute_force_topk(sdf, q, k=K).persist()
    approx = ivf_topk(sdf, q, cent, k=K, nprobe=2).persist()

    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q1] & ap.get(q1, set())) / len(ex[q1]) for q1 in ex]
    assert sum(recalls) / len(recalls) >= 0.6  # clustered corpus, nprobe=2
    exact.unpersist()
    approx.unpersist()
