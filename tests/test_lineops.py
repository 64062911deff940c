"""Line-level dedup: kernel vs plain-Python reference, plus query invariants."""

from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.queries import lineops

P = tk.POLY_P
SF = "/root/testdata/sf0.001"


def py_line_hashes(text: str, line_tokens: int = 8) -> list[int]:
    toks = [t for t in text.split() if t]
    th = []
    for t in toks:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % P
        th.append(h)
    out = []
    for g in range(0, len(th), line_tokens):
        h = 0
        for x in th[g : g + line_tokens]:
            h = (h * tk.COMBINE_A + x) % P
        out.append(h)
    return out


def test_line_hashes_matches_python(spark):
    texts = [
        "a b c d e f g h i j k",  # 11 tokens -> one full + one partial line
        "one two",  # single partial line
        "x " * 16,  # exactly two lines, repeated token
        "",  # no tokens -> no lines
        "   ",  # whitespace only -> no lines
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = (
        df.select("i", tk.line_hashes(tk.token_hashes(F.col("text"))).alias("lh"))
        .orderBy("i")
        .collect()
    )
    for row, text in zip(got, texts):
        assert list(row.lh) == py_line_hashes(text), text


def test_line_hashes_multiplicity_kept(spark):
    # the same 8-token line twice must produce two equal hashes (no distinct)
    text = ("w " * 8 + "w " * 8).strip()
    df = spark.createDataFrame([(text,)], "text string")
    (lh,) = df.select(tk.line_hashes(tk.token_hashes(F.col("text"))).alias("lh")).first()
    assert len(lh) == 2 and lh[0] == lh[1]


def test_line_dup_stats_invariants(spark):
    rows = lineops.line_dup_stats(spark, SF).collect()
    assert rows, "expected one row per non-empty document"
    for r in rows:
        assert 0 <= r.n_dup_lines <= r.n_lines
        assert r.dup_line_pm == 1000 * r.n_dup_lines // r.n_lines


def test_boilerplate_topk_ordering(spark):
    rows = lineops.boilerplate_lines_topk(spark, SF).collect()
    assert 0 < len(rows) <= lineops.BOILERPLATE_TOPK
    keys = [(-r.n_docs, -r.n_occurrences, r.line_hash) for r in rows]
    assert keys == sorted(keys)
    assert all(r.n_occurrences >= r.n_docs >= 1 for r in rows)


def test_line_language_purity_invariants(spark):
    rows = lineops.line_language_purity(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.majority_lang in {"en", "fr", "de", "es", "zh"}
        # majority share is at least 1/5 of lines and at most all of them
        assert 200 <= r.purity_pm <= 1000 or r.n_lines < 5
    # corpus is tagged by the generator: purity should be high on average
    assert sum(r.purity_pm for r in rows) / len(rows) > 500


def test_line_language_purity_mixed_doc(spark):
    # first 8-token line English markers, second 8-token line German markers
    text = "the a of and to the a of der die und das ein der die und"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    import os, tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    (r,) = lineops.line_language_purity(spark, d).collect()
    assert r.n_lines == 2 and r.purity_pm == 500
    assert r.majority_lang == "en"  # 1-1 tie -> largest lang string wins (both engines)
