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


def line_language_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Mixed-language detection: each 8-token line gets a language vote
    (stopword-marker scoring with textops.lang_id's fixed tie-break order),
    and the document reports (doc_id, majority_lang, n_lines, purity_pm)
    where purity_pm = 1000·majority_votes div n_lines. Corpus prep drops or
    splits low-purity documents — per-doc language ID alone can't see a
    half-English/half-German page (the classic boilerplate-translation
    artifact).

    Scale shape: line scoring is the explode's map stage (array_contains
    over 5×5 literal stopwords, pure codegen); the only shuffles are the
    (doc_id, line_lang) vote count and the per-doc argmax — both keyed by
    doc, both tiny rows. No window over the corpus: the argmax is a
    max(struct) inside one hash agg."""
    from spider_go_spark.queries.textops import _STOPWORDS

    d = T(spark, sf, "documents")
    toks = d.select("doc_id", tk.tokens(F.col("text")).alias("tokens"))
    n_lines = F.ceil(F.size("tokens") / LINE_TOKENS).cast("int")
    gidx = F.when(n_lines > 0, F.sequence(F.lit(0), n_lines - 1)).otherwise(
        F.array().cast("array<int>")
    )
    line_arr = F.transform(
        gidx, lambda g: F.slice(F.col("tokens"), g * LINE_TOKENS + 1, LINE_TOKENS)
    )
    lines = toks.select("doc_id", F.explode(line_arr).alias("line"))

    def score(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(F.col("line"), lambda t: F.array_contains(arr, t))).cast(
            "bigint"
        )

    s = {lg: score(words) for lg, words in _STOPWORDS.items()}
    pred = (
        F.when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), F.lit("fr"))
        .when((s["de"] >= s["es"]) & (s["de"] >= s["zh"]), F.lit("de"))
        .when(s["es"] >= s["zh"], F.lit("es"))
        .otherwise(F.lit("zh"))
    )
    votes = lines.select("doc_id", pred.alias("line_lang")).groupBy(
        "doc_id", "line_lang"
    ).agg(F.count(F.lit(1)).alias("votes"))
    per_doc = votes.groupBy("doc_id").agg(
        F.sum("votes").alias("n_lines"),
        # deterministic argmax: max struct orders by (votes, lang) — the
        # tie-break is the LARGEST lang string, mirrored in the oracle
        F.max(F.struct(F.col("votes"), F.col("line_lang"))).alias("m"),
    )
    return per_doc.select(
        "doc_id",
        F.col("m.line_lang").alias("majority_lang"),
        "n_lines",
        F.expr("1000 * m.votes div n_lines").alias("purity_pm"),
    ).orderBy("doc_id")


def _line_score_sql(words: list[str]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return f"len(list_filter(line, t -> list_contains([{lst}], t)))::BIGINT"


def _purity_sql() -> str:
    from spider_go_spark.queries.textops import _STOPWORDS

    return rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(list_transform(range(0, (len(tokens) + {LINE_TOKENS - 1}) // {LINE_TOKENS}),
            g -> tokens[g*{LINE_TOKENS}+1 : g*{LINE_TOKENS}+{LINE_TOKENS}])) AS line
  FROM toks WHERE len(tokens) > 0
), scored AS (
  SELECT doc_id,
         {_line_score_sql(_STOPWORDS["en"])} AS s_en,
         {_line_score_sql(_STOPWORDS["fr"])} AS s_fr,
         {_line_score_sql(_STOPWORDS["de"])} AS s_de,
         {_line_score_sql(_STOPWORDS["es"])} AS s_es,
         {_line_score_sql(_STOPWORDS["zh"])} AS s_zh
  FROM lines
), voted AS (
  SELECT doc_id,
         CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
              WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
              WHEN s_es >= s_zh THEN 'es'
              ELSE 'zh' END AS line_lang
  FROM scored
), votes AS (
  SELECT doc_id, line_lang, count(*) AS votes FROM voted GROUP BY doc_id, line_lang
), ranked AS (
  SELECT doc_id, line_lang, votes,
         sum(votes) OVER (PARTITION BY doc_id) AS n_lines,
         row_number() OVER (PARTITION BY doc_id ORDER BY votes DESC, line_lang DESC) AS rk
  FROM votes
)
SELECT doc_id, line_lang AS majority_lang, n_lines::BIGINT AS n_lines,
       ((1000 * votes) // n_lines)::BIGINT AS purity_pm
FROM ranked WHERE rk = 1 ORDER BY doc_id
"""


QUERIES = {
    "line_dup_stats": line_dup_stats,
    "boilerplate_lines_topk": boilerplate_lines_topk,
    "line_language_purity": line_language_purity,
}
ORACLES = {
    "line_dup_stats": LINE_DUP_STATS_SQL,
    "boilerplate_lines_topk": BOILERPLATE_TOPK_SQL,
    "line_language_purity": _purity_sql(),
}
