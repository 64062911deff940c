r"""Line-level dedup operators over ``documents`` (CCNet / RefinedWeb style).

Large-scale corpus prep removes *lines* (paragraphs) that repeat across many
documents — navigation chrome, cookie banners, boilerplate footers — before
any document-level dedup. The reference has no text surface (SURVEY.md
§2.12); these are north-rule training-data additions alongside
queries/textops.py.

The corpus text is a whitespace token stream with no newlines, so a "line"
is a deterministic consecutive 8-token group (functions/textkernel.
line_hashes — same synthesis convention as the interleaved-span queries in
queries/mediaops.py). Both queries share one exploded (doc_id, line_hash)
relation.

Scale notes (100 TB corpus):
- the explode fans out to ~tokens/8 rows per doc — linear, no pair blowup;
- corpus line frequencies are ONE hash-partitioned groupBy on line_hash
  (uniform 30-bit keys; the skew is exactly the boilerplate we're mining,
  and AQE splits those hot keys);
- per-doc stats re-join line rows to corpus counts by line_hash (content-
  keyed equi-join, broadcastable when the dup-line dictionary is small) and
  re-aggregate by doc_id — three shuffles total, each on a uniform key;
- nothing is quadratic and nothing collects: the same plan at 10^10 docs is
  the published CCNet pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.queries import T

LINE_TOKENS = 8  # tokens per synthetic "line" (corpus has no newlines)
BOILERPLATE_TOPK = 20

# DuckDB twin of textkernel.token_hashes + line_hashes: per-token polynomial
# char hashes, then non-overlapping LINE_TOKENS-groups folded with
# h' = h*1000003 + tok_hash mod P (trailing partial group kept). DuckDB list
# slicing th[a:b] is 1-based inclusive and clamps at the end, matching
# Spark's F.slice semantics.
_LINES_CTE = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), th AS (
  SELECT doc_id,
         list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007)) AS th
  FROM toks
), doc_lines AS (
  SELECT doc_id,
         list_transform(range(0, (len(th) + {LINE_TOKENS - 1}) // {LINE_TOKENS}),
            g -> list_reduce(
                   list_prepend(0::BIGINT, th[g*{LINE_TOKENS}+1 : g*{LINE_TOKENS}+{LINE_TOKENS}]),
                   (a, b) -> (a*1000003 + b) % 1000000007)) AS lh
  FROM th
), line_rows AS (
  SELECT doc_id, unnest(lh) AS line_hash FROM doc_lines
)
"""


def _line_rows(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, line_hash) — one row per line occurrence, in-document
    multiplicity preserved. Map-only until the explode; the token-hash
    array is materialized as its own projection first (textkernel
    token_hashes docstring: Catalyst re-evaluates HOF-captured
    expressions per reference).

    Eager localCheckpoint: both consumers read this relation twice (the
    corpus-frequency branch and the per-line probe side of the join), and
    the char-level hashing upstream is the expensive part — without the
    checkpoint it runs once per branch (measured 11.2 s → ~5 s at sf0.1).
    localCheckpoint, not persist: no CacheManager entry to leak per call
    (same hygiene rule as vectorops/textops)."""
    d = T(spark, sf, "documents")
    th = d.select("doc_id", tk.token_hashes(F.col("text")).alias("th"))
    lines = th.select(
        "doc_id", tk.line_hashes(F.col("th"), LINE_TOKENS).alias("lh")
    )
    return lines.select("doc_id", F.explode("lh").alias("line_hash")).localCheckpoint(
        eager=True
    )


def line_dup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document line-dedup report: (doc_id, n_lines, n_dup_lines,
    dup_line_pm) where a line is "dup" when its hash occurs in ≥2 distinct
    documents corpus-wide, and dup_line_pm = 1000·n_dup_lines div n_lines
    (integer per-mille, cross-engine exact).

    This is the document-side signal CCNet thresholds on before dropping
    boilerplate-heavy pages. Plan: explode → groupBy(line_hash) distinct-doc
    counts → equi-join back → groupBy(doc_id). All shuffles keyed by
    uniform hashes; no window, no collect."""
    rows = _line_rows(spark, sf)
    freq = rows.groupBy("line_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = rows.join(freq, "line_hash")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
                "n_dup_lines"
            ),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_dup_lines",
            F.expr("1000 * n_dup_lines div n_lines").alias("dup_line_pm"),
        )
        .orderBy("doc_id")
    )


LINE_DUP_STATS_SQL = (
    _LINES_CTE
    + """
, freq AS (
  SELECT line_hash, count(DISTINCT doc_id) AS n_docs
  FROM line_rows GROUP BY line_hash
)
SELECT r.doc_id,
       count(*) AS n_lines,
       sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_lines,
       (1000 * sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT)
         // count(*) AS dup_line_pm
FROM line_rows r JOIN freq f USING (line_hash)
GROUP BY r.doc_id
ORDER BY r.doc_id
"""
)


def boilerplate_lines_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 boilerplate lines: (line_hash, n_docs, n_occurrences) ranked
    by how many distinct documents contain the line — the dictionary a
    CCNet-style pipeline broadcasts to strip chrome/footers at scale.

    One groupBy(line_hash) then TakeOrderedAndProject(k=20) — the global
    sort never materializes. Deterministic total order: (n_docs desc,
    n_occurrences desc, line_hash asc)."""
    rows = _line_rows(spark, sf)
    return (
        rows.groupBy("line_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), F.asc("line_hash")
        )
        .limit(BOILERPLATE_TOPK)
    )


BOILERPLATE_TOPK_SQL = (
    _LINES_CTE
    + f"""
SELECT line_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM line_rows
GROUP BY line_hash
ORDER BY n_docs DESC, n_occurrences DESC, line_hash ASC
LIMIT {BOILERPLATE_TOPK}
"""
)


QUERIES = {
    "line_dup_stats": line_dup_stats,
    "boilerplate_lines_topk": boilerplate_lines_topk,
}
ORACLES = {
    "line_dup_stats": LINE_DUP_STATS_SQL,
    "boilerplate_lines_topk": BOILERPLATE_TOPK_SQL,
}
