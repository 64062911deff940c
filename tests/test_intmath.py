"""Integer binary-log kernel: the Python reference, the Catalyst fold and
the DuckDB recursive CTE must agree bigint-for-bigint (the BM25 gate's
exactness rests on this), and the reference must track true log2 within
the documented 2^-14-bit bound."""

import math
import random

import duckdb
import pytest

from spider_go_spark.functions.intmath import (
    int_log2_q20,
    log2_q20,
    log2_q20_duckdb_ctes,
)

CASES = [(1, 1), (2, 1), (3, 2), (1002, 771), (2**35, 3), (10**14, 10**14 - 1),
         ((1 << 46) - 1, 1), (7, 7), (2**20 + 1, 2**20)]
rng = random.Random(11)
for _ in range(40):
    q = rng.randint(1, 1 << 30)
    CASES.append((rng.randint(q, min(q << 25, 1 << 46)), q))


def test_reference_tracks_true_log2():
    for p, q in CASES:
        got = int_log2_q20(p, q) / 2**20
        assert abs(got - math.log2(p / q)) < 2**-14, (p, q)


def test_reference_rejects_bad_domain():
    with pytest.raises(ValueError):
        int_log2_q20(1, 2)
    with pytest.raises(ValueError):
        int_log2_q20(0, 0)


def test_duckdb_cte_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE pq(k INTEGER, p BIGINT, q BIGINT)")
    for i, (p, q) in enumerate(CASES):
        con.execute("INSERT INTO pq VALUES (?,?,?)", [i, p, q])
    sql = ("WITH RECURSIVE " + log2_q20_duckdb_ctes("p", "q", "pq", "k")
           + " SELECT k, log2_q20 FROM lg ORDER BY k")
    got = dict(con.execute(sql).fetchall())
    for i, (p, q) in enumerate(CASES):
        assert got[i] == int_log2_q20(p, q), (p, q)


def test_spark_fold_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, p, q) for i, (p, q) in enumerate(CASES)], "k int, p long, q long"
    )
    got = {r["k"]: r["v"] for r in df.select("k", log2_q20("p", "q").alias("v")).collect()}
    for i, (p, q) in enumerate(CASES):
        assert got[i] == int_log2_q20(p, q), (p, q)


def test_spark_fold_is_pure_codegen(spark):
    df = spark.createDataFrame([(4, 3)], "p long, q long")
    plan = df.select(log2_q20("p", "q").alias("v"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_reference_fuzz_accuracy_and_monotonicity():
    """Property fuzz (hypothesis): accuracy bound over the full supported
    domain, plus weak monotonicity in p (a ranking kernel must never
    invert a strict ratio ordering by more than the documented error)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 1 << 30), st.integers(0, 1 << 16), st.integers(0, 25))
    def run(q, dp, shift):
        p = min((q + dp) << shift, 1 << 46)
        p = max(p, q)
        got = int_log2_q20(p, q)
        assert abs(got / 2**20 - math.log2(p / q)) < 2**-14
        if p + 1 <= 1 << 46:
            # monotone within tolerance: log2((p+1)/q) >= log2(p/q) - eps
            assert int_log2_q20(p + 1, q) >= got - 2

    run()
