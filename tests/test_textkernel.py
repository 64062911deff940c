"""Unit tests for the JVM-side text kernel (hashing, shingles, MinHash,
SimHash) against plain-Python reference implementations."""

import pytest
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk

P = tk.POLY_P


def py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % P
    return h


def py_shingle_hashes(text: str, k: int = 3) -> set[int]:
    """Reference combine: tokens hashed once, k-windows folded with
    h' = h*COMBINE_A + tok_hash mod P (mirrors textkernel.shingle_hashes)."""
    toks = [t for t in text.split() if t]
    if len(toks) < k:
        return set()
    th = [py_poly_hash(t) for t in toks]
    out = set()
    for i in range(len(toks) - k + 1):
        h = th[i]
        for j in range(1, k):
            h = (h * tk.COMBINE_A + th[i + j]) % P
        out.add(h)
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "one two",
    "",
    "a a a a a",
    "key agg row scan slow fast table value",
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["id", "text"])


def test_poly_hash_matches_python(spark, df):
    rows = df.select("text", tk.poly_hash("text").alias("h")).collect()
    for r in rows:
        assert r["h"] == py_poly_hash(r["text"]), r["text"]


def test_shingle_hashes_match_python(spark, df):
    rows = df.select("text", tk.shingle_hashes(F.col("text")).alias("hs")).collect()
    for r in rows:
        assert sorted(r["hs"]) == sorted(py_shingle_hashes(r["text"])), r["text"]


def test_minhash_signature_matches_python(spark, df):
    rows = df.select(
        "text", tk.minhash_signature(tk.shingle_hashes(F.col("text"))).alias("sig")
    ).collect()
    for r in rows:
        hashes = py_shingle_hashes(r["text"])
        for i, got in enumerate(r["sig"]):
            a, b = 2 * i + 1, 10_007 * i + 3
            expect = min(((a * h + b) % P for h in hashes), default=P)
            assert got == expect, (r["text"], i)


def test_minhash_similarity_correlates_with_jaccard(spark):
    """Near-identical docs share most signature slots; disjoint docs none."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    far = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    sdf = spark.createDataFrame([(0, base), (1, near), (2, far)], ["id", "text"])
    sigs = {
        r["id"]: r["sig"]
        for r in sdf.select(
            "id", tk.minhash_signature(tk.shingle_hashes(F.col("text"))).alias("sig")
        ).collect()
    }
    match_near = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    match_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert match_near >= 10  # high overlap (J ≈ 0.8 over shingle sets)
    assert match_far == 0


def test_simhash_matches_python(spark, df):
    rows = df.select(
        "text", tk.simhash(tk.shingle_hashes(F.col("text"))).alias("sh")
    ).collect()
    for r in rows:
        hashes = list(py_shingle_hashes(r["text"]))
        expect = 0
        for j in range(tk.SIMHASH_BITS):
            votes = sum(1 if (h >> j) % 2 == 1 else -1 for h in hashes)
            if votes > 0:
                expect += 1 << j
        assert r["sh"] == expect, r["text"]


def test_hamming64(spark):
    sdf = spark.createDataFrame([(0b1011, 0b0001)], ["a", "b"])
    assert sdf.select(tk.hamming64(F.col("a"), F.col("b")).alias("d")).first()["d"] == 2


def test_no_per_row_python_in_plan(spark, df):
    """The whole text kernel must stay JVM-side: no BatchEvalPython
    (row-at-a-time Python UDF) in any kernel plan (SURVEY.md §7.4)."""
    out = df.select(
        tk.poly_hash("text").alias("h"),
        tk.minhash_signature(tk.shingle_hashes(F.col("text"))).alias("sig"),
        tk.simhash(tk.shingle_hashes(F.col("text"))).alias("sh"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # not even pandas UDFs: pure Catalyst


def test_simhash_arrow_null_matches_fold(spark):
    """ADVICE r4: a null shingle array (e.g. null text upstream) must not
    kill the Arrow kernel's stage — and both forms must agree. The fold
    form yields 0 for a null array (when(null > 0).otherwise(0) takes the
    otherwise branch on every bit), so the Arrow kernel does too."""
    from spider_go_spark.functions.arrowkernels import simhash_arrow

    sdf = spark.createDataFrame(
        [(0, [3, 17, 255]), (1, None), (2, [])], "i int, h array<long>"
    )
    rows = {
        r["i"]: (r["fold"], r["arrow"])
        for r in sdf.select(
            "i",
            tk.simhash(F.col("h")).alias("fold"),
            simhash_arrow(F.col("h")).alias("arrow"),
        ).collect()
    }
    for i, (fold, arrow) in rows.items():
        assert fold == arrow, (i, fold, arrow)
    assert rows[1] == (0, 0) and rows[2] == (0, 0)
