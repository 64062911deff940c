"""Sketch + corpus-statistics operators: HyperLogLog distinct counting,
Count-Min heavy hitters, TF-IDF term ranking, Gopher-style repetition
quality, and deterministic stratified sampling.

Each is the scale-shaped plan (map-side-combinable sketch state, explode +
hash-agg term stats, window-rank sampling) with every output in integer or
exact-string form, value-checkable against a DuckDB oracle (the common
int64 multiplicative-hash family from :mod:`operators.sampling` /
:mod:`operators.sketches` makes the sketches bit-identical cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.operators import sketches
from spider_go_spark.operators.sampling import HASH_A, HASH_P
from spider_go_spark.queries import T

# --------------------------------------------------------------------------
# HyperLogLog distinct users per event type
# --------------------------------------------------------------------------


def hll_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type HLL(64-register) distinct-user estimate, with the
    exact count alongside — at 100 TB the exact branch is the one you drop;
    here it documents the sketch's error in the gate output itself."""
    e = T(spark, sf, "events")
    est = sketches.hll_estimate(e, "user_id", ["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


HLL_DISTINCT_USERS_SQL = f"""
WITH est AS ({sketches.hll_oracle_sql("events", "user_id", ["event_type"])}),
exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT est.event_type, est.hll_est, est.n_registers_used, exact.exact_distinct
FROM est JOIN exact USING (event_type)
"""


# --------------------------------------------------------------------------
# Count-Min heavy hitters
# --------------------------------------------------------------------------

_TOP_USERS = 20


def heavy_hitters_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 users by exact event count, with the Count-Min(4x128)
    estimate alongside (cms_est >= exact_cnt always). The sketch build is
    one map-side-combined agg to 512 cells; only the candidate probe joins.
    """
    e = T(spark, sf, "events")
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(_TOP_USERS)
    )
    est = sketches.cms_estimates(e, "user_id", top.select("user_id"))
    return top.join(est, "user_id").select("user_id", "exact_cnt", "cms_est")


HEAVY_HITTERS_CMS_SQL = f"""
WITH top AS (
  SELECT user_id, count(*)::BIGINT AS exact_cnt
  FROM events GROUP BY user_id
  ORDER BY exact_cnt DESC, user_id ASC LIMIT {_TOP_USERS}
),
cells AS ({sketches.cms_cells_sql("events", "user_id")}),
probe AS (
  SELECT t.user_id, i.i,
         (((t.user_id % {sketches.HASH_P}) *
           CASE i.i
             WHEN 0 THEN {sketches.CMS_AS[0]}
             WHEN 1 THEN {sketches.CMS_AS[1]}
             WHEN 2 THEN {sketches.CMS_AS[2]}
             ELSE {sketches.CMS_AS[3]} END) % {sketches.HASH_P}) % {sketches.CMS_W} AS b
  FROM top t, (SELECT unnest(range(0, {len(sketches.CMS_AS)})) AS i) i
)
SELECT top.user_id, top.exact_cnt, est.cms_est
FROM top JOIN (
  SELECT p.user_id, min(c.cnt)::BIGINT AS cms_est
  FROM probe p JOIN cells c ON p.i = c.i AND p.b = c.b
  GROUP BY p.user_id
) est USING (user_id)
"""


# --------------------------------------------------------------------------
# TF-IDF term ranking
# --------------------------------------------------------------------------

_TOP_TERMS = 20


def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-20 alpha terms by integer-scaled rarity-weighted
    frequency: score = tf_total * N_docs * 1000 div df. (For a global
    ranking this is the monotone integer analogue of tf * idf with the
    log dropped — chosen so the score is one exact integer division,
    bit-identical cross-engine; a float ln() would not hash-match.)

    Plan: explode tokens -> one hash agg per term (map-side combined
    count + distinct-doc count) -> top-k. The N_docs scalar joins as a
    broadcast of a 1-row aggregate."""
    d = T(spark, sf, "documents")
    terms = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(tk.tokens(F.col("text")), lambda t: t.rlike("^[a-z]+$"))
            ).alias("term"),
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf_total"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        terms.crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.expr("tf_total * __n * 1000 div df"))
        .select("term", "tf_total", "df", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(_TOP_TERMS)
    )


TFIDF_TOP_TERMS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                                    t -> regexp_full_match(t, '[a-z]+'))) AS term
  FROM documents
),
terms AS (
  SELECT term, count(*)::BIGINT AS tf_total, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY term
)
SELECT term, tf_total, df,
       (tf_total * (SELECT count(*) FROM documents) * 1000) // df AS score
FROM terms
ORDER BY score DESC, term ASC LIMIT {_TOP_TERMS}
"""


# --------------------------------------------------------------------------
# Gopher-style repetition quality
# --------------------------------------------------------------------------

# keep-thresholds (parts-per-million): most-frequent-bigram fraction <= 18%
# and duplicate-token fraction <= 30% — the Gopher repetition-filter shape
# with integer ppm arithmetic instead of float fractions.
_MAX_TOP_BIGRAM_PPM = 180_000
_MAX_DUP_TOKEN_PPM = 300_000


def repetition_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document repetition metrics: duplicate-token ppm and
    most-frequent-bigram ppm, plus the keep/drop decision. All-integer
    (ppm = x * 1e6 div n) so the gate hash is exact.

    Plan: one explode+hash-agg for the per-doc bigram mode (map-side
    combined), joined back to the map-only token stats — no window over
    the raw token stream."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    base = (
        d.withColumn("__toks", toks)
        .select(
            "doc_id",
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("__toks")).cast("bigint").alias("__n_distinct"),
            F.when(
                F.size("__toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(__toks) - 1), "
                    "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("__bigrams"),
        )
    )
    top_bigram = (
        base.select("doc_id", F.explode("__bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").cast("bigint").alias("__top_bg"))
    )
    out = (
        base.join(top_bigram, "doc_id", "left")
        .withColumn(
            "dup_token_ppm",
            F.expr("(n_tokens - __n_distinct) * 1000000 div n_tokens"),
        )
        .withColumn(
            "top_bigram_ppm",
            F.when(
                F.col("n_tokens") >= 2,
                F.expr("coalesce(__top_bg, 0) * 1000000 div (n_tokens - 1)"),
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .withColumn(
            "keep",
            (F.col("dup_token_ppm") <= _MAX_DUP_TOKEN_PPM)
            & (F.col("top_bigram_ppm") <= _MAX_TOP_BIGRAM_PPM),
        )
    )
    return out.select("doc_id", "n_tokens", "dup_token_ppm", "top_bigram_ppm", "keep")


REPETITION_QUALITY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
),
base AS (
  SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
         len(list_distinct(tokens))::BIGINT AS n_distinct,
         CASE WHEN len(tokens) >= 2
              THEN list_transform(range(1, len(tokens)),
                                  i -> tokens[i] || ' ' || tokens[i + 1])
              ELSE [] END AS bigrams
  FROM toks
),
topbg AS (
  SELECT doc_id, max(c)::BIGINT AS top_bg FROM (
    SELECT doc_id, bg, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS bg FROM base)
    GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       ((b.n_tokens - b.n_distinct) * 1000000) // b.n_tokens AS dup_token_ppm,
       CASE WHEN b.n_tokens >= 2
            THEN (coalesce(t.top_bg, 0) * 1000000) // (b.n_tokens - 1)
            ELSE 0 END AS top_bigram_ppm,
       (((b.n_tokens - b.n_distinct) * 1000000) // b.n_tokens <= {_MAX_DUP_TOKEN_PPM}
        AND (CASE WHEN b.n_tokens >= 2
                  THEN (coalesce(t.top_bg, 0) * 1000000) // (b.n_tokens - 1)
                  ELSE 0 END) <= {_MAX_TOP_BIGRAM_PPM}) AS keep
FROM base b LEFT JOIN topbg t USING (doc_id)
"""


# --------------------------------------------------------------------------
# Deterministic stratified sample
# --------------------------------------------------------------------------

_SAMPLE_K = 25


def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic k-per-stratum sample: within each lang, the 25
    documents with the smallest hash of doc_id (tie-broken by doc_id).
    Equivalent to uniform sampling without replacement, but reproducible
    across runs/engines and stable under partitioning. One shuffle on the
    stratum key; at scale, pre-filter with a conservative hash threshold
    so the window only ranks ~k candidates per stratum instead of the
    whole corpus."""
    d = T(spark, sf, "documents")
    h = (F.col("doc_id") % HASH_P) * F.lit(HASH_A) % HASH_P
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _SAMPLE_K)
        .select("doc_id", "lang", "source", "sample_rank")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, sample_rank FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % {HASH_P}) * {HASH_A}) % {HASH_P} ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {_SAMPLE_K}
"""


QUERIES = {
    "hll_distinct_users": hll_distinct_users,
    "heavy_hitters_cms": heavy_hitters_cms,
    "tfidf_top_terms": tfidf_top_terms,
    "repetition_quality": repetition_quality,
    "stratified_sample": stratified_sample,
}

ORACLES = {
    "hll_distinct_users": HLL_DISTINCT_USERS_SQL,
    "heavy_hitters_cms": HEAVY_HITTERS_CMS_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "repetition_quality": REPETITION_QUALITY_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
}
