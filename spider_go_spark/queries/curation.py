r"""Corpus-curation operators over ``documents``: model-based quality
filtering and DSIR-style importance weighting.

Two stages every large-scale training-data pipeline runs AFTER dedup and
heuristic cleaning, and that the reference (a crawl/workflow engine with no
text surface, SURVEY.md §2.12) leaves to downstream consumers:

- **Model-based quality filter** (GPT-3 / LLaMA / CCNet style): a trained
  linear classifier scores each document and the pipeline keeps documents
  above a threshold. Training happens offline; at corpus scale the model is
  a handful of weights applied as a projection. Here the weights are fixed
  integer literals (same convention as the inlined IVF centroids /
  PQ codebooks in queries/vectorops.py) and every feature is an exact
  integer ratio, so the score is bit-identical across engines.

- **DSIR importance weighting** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score each document by how
  much more likely its hashed-unigram features are under a small *target*
  corpus (here: the ``lang = 'en'`` slice, standing in for the curated
  Wikipedia-like target) than under the raw source corpus. The published
  method uses log-likelihood ratios of hashed n-gram counts; this integer
  variant uses the per-million frequency *difference* per bucket, summed
  over token occurrences — monotone in the same signal for unigram models,
  with no floats anywhere (same exactness discipline as pmi_collocations'
  cross-ratio trick in queries/pipelineops.py).

Scale shape (100 TB corpus):
- the quality filter is a pure map-side projection (tokenize + three array
  folds per doc, whole-stage codegen) — zero shuffles;
- DSIR builds a model of at most ``DSIR_BUCKETS`` rows (two hash aggs whose
  output is bounded by the bucket count, map-side partials do the heavy
  lifting), broadcasts it back to the exploded token stream, and
  re-aggregates by doc_id — shuffles are keyed by uniform hash buckets and
  doc ids, never by content pairs; nothing is quadratic, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.queries import T

# ---------------------------------------------------------------------------
# quality_logit_filter — fixed linear classifier in integer micro-units.
#
# Features (all exact integer per-mille / centi ratios):
#   stop_pm  = 1000 · n_stopwords  div n_tokens   (English-stopword density)
#   ttr_pm   = 1000 · n_distinct   div n_tokens   (type-token ratio)
#   cpt_cpm  =  100 · n_chars      div n_tokens   (centi-chars per token)
# The weights are the "offline-trained model" inlined as literals; the
# threshold is 0 (keep when logit_u >= 0).
W_BIAS = -1_400_000
W_STOP = 4_000       # natural prose has stopwords
W_TTR = 900          # repetitive boilerplate has a low type-token ratio
W_LEN = 1_200        # longer docs are better, saturating at LEN_CAP tokens
LEN_CAP = 400
W_CPT = -800         # penalty per centi-char distance from ideal 5.5 c/t
CPT_IDEAL = 550


def quality_logit_filter(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_tokens, stop_pm, ttr_pm, cpt_cpm, logit_u, keep) — the
    classifier-based quality gate. Pure codegen projection: tokenize once,
    three folds over the token array, one linear combination. Empty
    documents get all-zero features and fail the threshold (the bias is
    negative), mirrored exactly in the oracle."""
    from spider_go_spark.queries.textops import _STOPWORDS

    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_tok = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("bigint")
    n_dist = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    # integer ratios are computed from named columns in a second projection
    # so the expression tree stays readable; Catalyst collapses the pair
    feat = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_stop.alias("_ns"),
        n_dist.alias("_nd"),
        n_chars.alias("_nc"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("CASE WHEN n_tokens > 0 THEN 1000 * _ns div n_tokens ELSE 0 END").alias(
            "stop_pm"
        ),
        F.expr("CASE WHEN n_tokens > 0 THEN 1000 * _nd div n_tokens ELSE 0 END").alias(
            "ttr_pm"
        ),
        F.expr("CASE WHEN n_tokens > 0 THEN 100 * _nc div n_tokens ELSE 0 END").alias(
            "cpt_cpm"
        ),
    )
    logit = F.expr(
        f"{W_BIAS} + {W_STOP} * stop_pm + {W_TTR} * ttr_pm"
        f" + {W_LEN} * least(n_tokens, {LEN_CAP})"
        f" + {W_CPT} * abs(cpt_cpm - {CPT_IDEAL})"
    ).cast("bigint")
    return feat.select(
        "doc_id",
        "n_tokens",
        "stop_pm",
        "ttr_pm",
        "cpt_cpm",
        logit.alias("logit_u"),
        (logit >= 0).alias("keep"),
    ).orderBy("doc_id")


QUALITY_LOGIT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), feat AS (
  SELECT doc_id,
         len(tokens)::BIGINT AS n_tokens,
         len(list_filter(tokens, t -> list_contains(['the','a','of','and','to'], t)))::BIGINT AS ns,
         len(list_distinct(tokens))::BIGINT AS nd,
         list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> length(t)::BIGINT)),
                     (a,b) -> a+b)::BIGINT AS nc
  FROM toks
), ratios AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens > 0 THEN (1000 * ns) // n_tokens ELSE 0 END AS stop_pm,
         CASE WHEN n_tokens > 0 THEN (1000 * nd) // n_tokens ELSE 0 END AS ttr_pm,
         CASE WHEN n_tokens > 0 THEN (100 * nc) // n_tokens ELSE 0 END AS cpt_cpm
  FROM feat
)
SELECT doc_id, n_tokens, stop_pm, ttr_pm, cpt_cpm,
       ({W_BIAS} + {W_STOP} * stop_pm + {W_TTR} * ttr_pm
        + {W_LEN} * least(n_tokens, {LEN_CAP})
        + {W_CPT} * abs(cpt_cpm - {CPT_IDEAL}))::BIGINT AS logit_u,
       ({W_BIAS} + {W_STOP} * stop_pm + {W_TTR} * ttr_pm
        + {W_LEN} * least(n_tokens, {LEN_CAP})
        + {W_CPT} * abs(cpt_cpm - {CPT_IDEAL})) >= 0 AS keep
FROM ratios
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# dsir_importance — hashed-unigram importance weights, integer per-million.
DSIR_BUCKETS = 1024
DSIR_SCALE = 1_000_000  # per-million frequency units
DSIR_TARGET_LANG = "en"  # the curated-target stand-in slice


def dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_tokens, dsir_weight_u) — per-document importance weight:
    sum over token occurrences of (target per-million bucket frequency −
    corpus per-million bucket frequency), buckets = token poly-hash mod
    DSIR_BUCKETS. Positive = looks more like the target slice than the
    corpus average; a resampling pass keeps documents proportionally.

    Plan: one explode of the token-hash array; two bucket-keyed hash aggs
    whose outputs are ≤ DSIR_BUCKETS rows (map-side partials shrink the
    shuffle to buckets × partitions); totals are single-row aggregates
    cross-joined in (broadcast, no window over the corpus); the ≤1024-row
    model joins back to the occurrence stream via broadcast; one final
    doc-keyed agg, then a left join from ``documents`` so zero-token
    documents keep weight 0 (the oracle mirrors this)."""
    d = T(spark, sf, "documents")
    th_rows = d.select(
        "doc_id",
        "lang",
        F.explode(tk.token_hashes(F.col("text"))).alias("th"),
    ).withColumn("bucket", F.col("th") % DSIR_BUCKETS)

    corpus = th_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_s"))
    target = (
        th_rows.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    tot_s = corpus.agg(F.sum("n_s").alias("tot_s"))
    tot_t = target.agg(F.sum("n_t").alias("tot_t"))
    model = (
        corpus.join(target, "bucket", "left")
        .crossJoin(F.broadcast(tot_s))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            F.expr(
                f"{DSIR_SCALE} * coalesce(n_t, 0) div tot_t"
                f" - {DSIR_SCALE} * n_s div tot_s"
            ).alias("delta_u"),
        )
    )
    per_doc = (
        th_rows.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("delta_u").alias("dsir_weight_u"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("dsir_weight_u", F.lit(0)).cast("bigint").alias("dsir_weight_u"),
        )
        .orderBy("doc_id")
    )


DSIR_IMPORTANCE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
), th AS (
  SELECT doc_id, lang,
         unnest(list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007))) AS th
  FROM toks
), occ AS (
  SELECT doc_id, lang, th % {DSIR_BUCKETS} AS bucket FROM th
), corpus AS (
  SELECT bucket, count(*)::BIGINT AS n_s FROM occ GROUP BY bucket
), target AS (
  SELECT bucket, count(*)::BIGINT AS n_t FROM occ
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket
), model AS (
  SELECT c.bucket,
         ({DSIR_SCALE} * coalesce(t.n_t, 0)) // (SELECT sum(n_t) FROM target)
         - ({DSIR_SCALE} * c.n_s) // (SELECT sum(n_s) FROM corpus) AS delta_u
  FROM corpus c LEFT JOIN target t USING (bucket)
), per_doc AS (
  SELECT o.doc_id, count(*)::BIGINT AS n_tokens, sum(m.delta_u)::BIGINT AS w
  FROM occ o JOIN model m USING (bucket)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(p.w, 0)::BIGINT AS dsir_weight_u
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# gopher_rules_filter — the published rule-based gate (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", appendix A1.1 MassiveWeb filters),
# as named per-rule flags so a pipeline can report WHICH rule rejected a
# document (the filter-funnel input). All ratios are exact integer
# per-mille, so engine and oracle agree bit-for-bit.
#
# Published thresholds, with one documented divergence: the stopword rule
# requires ≥2 distinct stopwords of Gopher's 8-word set; the synthetic
# corpus vocabulary contains only one of them ("the"), so the gate uses
# GOPHER_MIN_STOP_KINDS = 1 to exercise both branches. The constants are
# module-level and shared with the oracle — flip them for a real corpus.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_MIN_PM = 3_000   # mean word length ≥ 3 chars (per-mille)
GOPHER_MWL_MAX_PM = 10_000  # ... ≤ 10 chars
GOPHER_MIN_ALPHA_PM = 800   # ≥80% of words contain an alphabetic char
GOPHER_MAX_SYMBOL_PM = 100  # ≤0.1 symbols (#, ...) per word
GOPHER_MIN_STOP_KINDS = 1   # published: 2 (see divergence note above)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gate entry: :func:`gopher_flags` over the ``documents`` table."""
    return gopher_flags(T(spark, sf, "documents")).orderBy("doc_id")


def gopher_flags(
    d: DataFrame,
    *,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    mwl_min_pm: int = GOPHER_MWL_MIN_PM,
    mwl_max_pm: int = GOPHER_MWL_MAX_PM,
    min_alpha_pm: int = GOPHER_MIN_ALPHA_PM,
    max_symbol_pm: int = GOPHER_MAX_SYMBOL_PM,
    min_stop_kinds: int = GOPHER_MIN_STOP_KINDS,
) -> DataFrame:
    """(doc_id, n_words, mwl_pm, alpha_pm, stop_kinds, symbol_pm,
    r_words, r_mwl, r_alpha, r_stop, r_symbol, keep) — the Gopher rule
    gate with per-rule flags over any (doc_id, text) DataFrame. Pure
    codegen projection (tokenize + four folds per doc), zero shuffles —
    map-only at any corpus size; the filter-funnel op
    (queries/pipelineops.py) and the corpus-build pipeline
    (plans/corpus_build.py) consume flags like these."""
    toks = tk.tokens(F.lower(F.col("text")))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_words = F.size(toks).cast("bigint")
    n_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint")
    stop_kinds = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("bigint")
    # symbol occurrences: '#' anywhere plus '...' runs (each counted once)
    n_symbol = (
        F.length(F.col("text")) - F.length(F.replace(F.col("text"), F.lit("#")))
        + (
            F.length(F.col("text"))
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / 3
    ).cast("bigint")
    feat = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("_nc"),
        n_alpha.alias("_na"),
        stop_kinds.alias("stop_kinds"),
        n_symbol.alias("_sy"),
    ).select(
        "doc_id",
        "n_words",
        F.expr("CASE WHEN n_words > 0 THEN 1000 * _nc div n_words ELSE 0 END").alias(
            "mwl_pm"
        ),
        F.expr("CASE WHEN n_words > 0 THEN 1000 * _na div n_words ELSE 0 END").alias(
            "alpha_pm"
        ),
        "stop_kinds",
        F.expr("CASE WHEN n_words > 0 THEN 1000 * _sy div n_words ELSE 0 END").alias(
            "symbol_pm"
        ),
    )
    rules = feat.select(
        "*",
        F.expr(
            f"n_words >= {min_words} AND n_words <= {max_words}"
        ).alias("r_words"),
        F.expr(
            f"mwl_pm >= {mwl_min_pm} AND mwl_pm <= {mwl_max_pm}"
        ).alias("r_mwl"),
        F.expr(f"alpha_pm >= {min_alpha_pm}").alias("r_alpha"),
        F.expr(f"stop_kinds >= {min_stop_kinds}").alias("r_stop"),
        F.expr(f"symbol_pm <= {max_symbol_pm}").alias("r_symbol"),
    )
    return rules.select(
        "*",
        F.expr("r_words AND r_mwl AND r_alpha AND r_stop AND r_symbol").alias("keep"),
    )  # no sort here: the DF-level helper stays a pure projection


GOPHER_RULES_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS tokens,
         text
  FROM documents
), feat AS (
  SELECT doc_id,
         len(tokens)::BIGINT AS n_words,
         list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> length(t)::BIGINT)),
                     (a,b) -> a+b)::BIGINT AS nc,
         len(list_filter(tokens, t -> regexp_matches(t, '[a-z]')))::BIGINT AS na,
         len(list_intersect(list_distinct(tokens),
             {GOPHER_STOPWORDS!r}))::BIGINT AS stop_kinds,
         ((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3)::BIGINT AS sy
  FROM toks
), ratios AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0 THEN (1000 * nc) // n_words ELSE 0 END AS mwl_pm,
         CASE WHEN n_words > 0 THEN (1000 * na) // n_words ELSE 0 END AS alpha_pm,
         stop_kinds,
         CASE WHEN n_words > 0 THEN (1000 * sy) // n_words ELSE 0 END AS symbol_pm
  FROM feat
), rules AS (
  SELECT *,
         (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS r_words,
         (mwl_pm >= {GOPHER_MWL_MIN_PM} AND mwl_pm <= {GOPHER_MWL_MAX_PM}) AS r_mwl,
         (alpha_pm >= {GOPHER_MIN_ALPHA_PM}) AS r_alpha,
         (stop_kinds >= {GOPHER_MIN_STOP_KINDS}) AS r_stop,
         (symbol_pm <= {GOPHER_MAX_SYMBOL_PM}) AS r_symbol
  FROM ratios
)
SELECT doc_id, n_words, mwl_pm, alpha_pm, stop_kinds, symbol_pm,
       r_words, r_mwl, r_alpha, r_stop, r_symbol,
       (r_words AND r_mwl AND r_alpha AND r_stop AND r_symbol) AS keep
FROM rules
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Deterministic weighted priority sample
# --------------------------------------------------------------------------
# The corpus-mixing stage needs *weighted* samples (longer / higher-quality
# documents drawn more often) that are reproducible run-over-run and
# engine-over-engine. Classic A-ES (Efraimidis & Spirakis, "Weighted random
# sampling with a reservoir", IPL 2006) keys each item by u^(1/w) with a
# fresh uniform u — float powers would break the bit-exact contract, so
# this integer variant keys by  priority = h(doc_id) div w  with h a fixed
# affine hash (classic LCG constants mod POLY_P): priority is uniform for
# w = 1 and stochastically decreasing in w, so the bottom-K per stratum is
# a weight-monotone deterministic sample — doubling a document's weight
# (at fixed hash) halves its priority and can only move it INTO the
# sample, never out. Not exactly proportional-to-weight like true A-ES
# (documented divergence); fully reproducible, mergeable, and rerunnable
# on any engine.
WSAMPLE_A = 1_103_515_245
WSAMPLE_B = 12_345
WSAMPLE_P = 1_000_000_007
WSAMPLE_K = 6     # sample size per stratum
WSAMPLE_SALT = 16 # phase-1 fan-out of the two-phase bottom-K cut


def weighted_doc_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Bottom-WSAMPLE_K documents per ``lang`` stratum by integer weighted
    priority (weight = n_chars): the deterministic weighted sample the
    corpus-mixing stage draws.

    Scale shape: the exact bottom-K is computed with the engine's salted
    two-phase cut (same discipline as operators/politeness.py) — a first
    row_number inside (lang, doc_id mod WSAMPLE_SALT) keeps ≤ K rows per
    salt lane, a second inside lang ranks the ≤ SALT·K survivors — so no
    single window task ever sees a whole stratum (strata are few and huge
    at 100 TB; an unsalted per-lang window would put one language on one
    task). The result is salt-invariant: the global bottom-K per lang is
    a pure function of (priority, doc_id) order."""
    from pyspark.sql.window import Window

    docs = T(spark, sf, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        (
            ((F.col("doc_id") * WSAMPLE_A + WSAMPLE_B) % WSAMPLE_P)
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).cast("long").alias("priority"),
    )
    w1 = Window.partitionBy("lang", F.pmod("doc_id", F.lit(WSAMPLE_SALT))).orderBy(
        "priority", "doc_id"
    )
    w2 = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        docs.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= WSAMPLE_K)
        .drop("_r1")
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= WSAMPLE_K)
        .drop("_r2")
    )


WEIGHTED_DOC_SAMPLE_SQL = f"""
WITH prio AS (
  SELECT lang, doc_id, n_chars,
         (((doc_id * {WSAMPLE_A} + {WSAMPLE_B}) % {WSAMPLE_P})
          // greatest(n_chars, 1))::BIGINT AS priority
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS r
  FROM prio
)
SELECT lang, doc_id, n_chars, priority FROM ranked WHERE r <= {WSAMPLE_K}
"""


# ---------------------------------------------------------------------------
# cluster_capped_sample — diversity-balanced corpus sampling: cap every
# semantic cluster's contribution (the DataComp / cluster-balanced recipe
# that stops one dominant content cluster — boilerplate, listings, spam
# farms — from flooding the training mix). Assignment reuses SemDeDup's
# anchor-centroid projection; within a cluster a deterministic
# multiplicative hash of vec_id picks the CAP survivors.
# ---------------------------------------------------------------------------

CCS_CAP = 12
CCS_MULT = 2654435761  # Knuth multiplicative hash constant
CCS_MOD = 1 << 32


def cluster_capped_sample(spark: SparkSession, sf: str) -> DataFrame:
    """(cluster_id, vec_id, label, priority) — at most ``CCS_CAP`` vectors
    per semantic cluster, chosen by a deterministic hash priority (so the
    sample is reproducible and uniform within a cluster, never biased by
    insert order).

    Scale shape (10^9 vectors): assignment is a pure projection (literal
    centroids, struct-min argmin — the SemDeDup path,
    queries/vectorops.py); the cap is a per-cluster top-k window whose
    partitions are the clusters — with K anchor clusters each partition
    sorts corpus/K rows locally after one hash shuffle, and a skewed
    mega-cluster is the salted two-phase-cut case
    (operators/politeness.py). Output is ≤ K·CAP rows."""
    from pyspark.sql.window import Window

    from spider_go_spark.queries.vectorops import (
        SEMDEDUP_K,
        _long_array_sql,
        _pq_quantize,
    )

    e = T(spark, sf, "embeddings").select(
        "vec_id", "label", _pq_quantize(F.col("embedding")).alias("v")
    )
    cent_rows = sorted(
        e.filter(F.col("vec_id") < SEMDEDUP_K).select("vec_id", "v").collect(),
        key=lambda r: r["vec_id"],
    )
    structs = ", ".join(
        "struct(aggregate(zip_with(v, "
        + _long_array_sql(list(r["v"]))
        + ", (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x)"
        + f" as d2, {int(r['vec_id'])} as cid)"
        for r in cent_rows
    )
    best = F.expr(f"array_min(array({structs}))")
    a = e.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("label").cast("int").alias("label"),
        best["cid"].cast("int").alias("cluster_id"),
        (F.col("vec_id").cast("bigint") * CCS_MULT % CCS_MOD).alias("priority"),
    )
    w = Window.partitionBy("cluster_id").orderBy("priority", "vec_id")
    return (
        a.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= CCS_CAP)
        .select("cluster_id", "vec_id", "label", "priority")
    )


def _ccs_sql() -> str:
    from spider_go_spark.queries.vectorops import DIMS, PQ_SCALE, SEMDEDUP_K

    return f"""
WITH sq AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> floor(x::DOUBLE * {PQ_SCALE})::BIGINT) AS v
  FROM embeddings
), cent AS (
  SELECT vec_id::INT AS cid, v AS cv FROM sq WHERE vec_id < {SEMDEDUP_K}
), scored AS (
  SELECT s.vec_id, s.label, c.cid,
         list_reduce(list_prepend(0::BIGINT, list_transform(range(1, {DIMS + 1}),
           i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i]))), (a, b) -> a + b) AS d2
  FROM sq s CROSS JOIN cent c
), assign AS (
  SELECT vec_id::BIGINT AS vec_id, label::INT AS label, cid AS cluster_id,
         (vec_id::BIGINT * {CCS_MULT} % {CCS_MOD}) AS priority
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM scored
  ) WHERE rk = 1
)
SELECT cluster_id, vec_id, label, priority FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY priority, vec_id) AS r
  FROM assign
) WHERE r <= {CCS_CAP}
"""


CLUSTER_CAPPED_SAMPLE_SQL = _ccs_sql()


# ---------------------------------------------------------------------------
# bitext_candidates — cross-lingual parallel-document mining (the
# ParaCrawl/CCMatrix recipe's cheap candidate stage): documents from the
# SAME source in DIFFERENT languages that share rare "anchor" tokens
# (numbers, names, codes — here: corpus df ≤ ANCHOR_DF_MAX) and have
# compatible lengths. Real pipelines follow with an alignment model; the
# candidate stage is the part that must be scale-shaped, because it is the
# only stage that looks at every document pair — and here it never does:
# candidates come from an anchor-token equi-join (content-keyed, hub-free
# by the df cap), never a cross join.
# ---------------------------------------------------------------------------

ANCHOR_DF_MAX = 30  # a token this rare is an anchor (tuned: the synthetic
                    # corpus's rarest cross-lingual token has df 25; real
                    # pipelines anchor on numbers/entities with tiny df —
                    # the df-capped equi-join SHAPE is the recipe)
ANCHOR_MIN = 1      # pairs must share at least this many distinct anchors


def bitext_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """(source, doc_id_a, doc_id_b, lang_a, lang_b, n_anchors,
    len_ratio_pm) — same-source cross-language doc pairs sharing ≥
    ANCHOR_MIN distinct rare anchors, with token counts within 2× of each
    other (len_ratio_pm = 1000·min/max, exact integer).

    Scale shape: one word-count df agg builds the anchor set (bounded by
    the rare tail); the pair stage explodes only anchor occurrences and
    equi-joins on the anchor token — fan-out per anchor ≤ ANCHOR_DF_MAX²,
    so candidate count is Σ df² over anchors, never N². Lengths ride the
    exploded rows, the final agg is pair-keyed."""
    d = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "source",
        tk.tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id", "lang", "source",
        F.size("toks").cast("long").alias("n_tokens"),
        F.explode(F.array_distinct("toks")).alias("t"),
    )
    df_t = d.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    anchors = df_t.filter(F.col("df") <= ANCHOR_DF_MAX).select("t")
    at = d.join(anchors, "t")
    a = at.select(
        "t", F.col("source").alias("source"),
        F.col("doc_id").alias("doc_id_a"), F.col("lang").alias("lang_a"),
        F.col("n_tokens").alias("na"),
    )
    b = at.select(
        "t", F.col("source").alias("source_b"),
        F.col("doc_id").alias("doc_id_b"), F.col("lang").alias("lang_b"),
        F.col("n_tokens").alias("nb"),
    )
    pairs = (
        a.join(b, (a["t"] == b["t"]) & (a["source"] == b["source_b"])
               & (a["lang_a"] < b["lang_b"]))
        .groupBy("source", "doc_id_a", "doc_id_b", "lang_a", "lang_b", "na", "nb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_anchors"))
        .filter(
            (F.col("n_anchors") >= ANCHOR_MIN)
            & (2 * F.least("na", "nb") >= F.greatest("na", "nb"))
            & (F.least("na", "nb") > 0)
        )
    )
    return pairs.select(
        "source", "doc_id_a", "doc_id_b", "lang_a", "lang_b", "n_anchors",
        # integer `div`, not float `/`+cast: keeps the cross-engine parity
        # contract purely integral (≡ DuckDB `//` at any magnitude)
        F.expr("(1000 * least(na, nb)) div greatest(na, nb)")
        .cast("bigint").alias("len_ratio_pm"),
    )


BITEXT_CANDIDATES_SQL = rf"""
WITH d AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS toks
  FROM documents
), ex AS (
  SELECT doc_id, lang, source, len(toks)::BIGINT AS n_tokens,
         unnest(list_distinct(toks)) AS t
  FROM d
), anchors AS (
  SELECT t FROM ex GROUP BY t HAVING count(*) <= {ANCHOR_DF_MAX}
), at AS (
  SELECT ex.* FROM ex JOIN anchors USING (t)
), pairs AS (
  SELECT a.source, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         a.lang AS lang_a, b.lang AS lang_b,
         a.n_tokens AS na, b.n_tokens AS nb,
         count(*)::BIGINT AS n_anchors
  FROM at a JOIN at b
    ON a.t = b.t AND a.source = b.source AND a.lang < b.lang
  GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT source, doc_id_a, doc_id_b, lang_a, lang_b, n_anchors,
       (1000 * least(na, nb) // greatest(na, nb))::BIGINT AS len_ratio_pm
FROM pairs
WHERE n_anchors >= {ANCHOR_MIN}
  AND 2 * least(na, nb) >= greatest(na, nb)
  AND least(na, nb) > 0
"""


QUERIES = {
    "quality_logit_filter": quality_logit_filter,
    "dsir_importance": dsir_importance,
    "gopher_rules_filter": gopher_rules_filter,
    "weighted_doc_sample": weighted_doc_sample,
    "cluster_capped_sample": cluster_capped_sample,
    "bitext_candidates": bitext_candidates,
}
ORACLES = {
    "quality_logit_filter": QUALITY_LOGIT_SQL,
    "dsir_importance": DSIR_IMPORTANCE_SQL,
    "gopher_rules_filter": GOPHER_RULES_SQL,
    "weighted_doc_sample": WEIGHTED_DOC_SAMPLE_SQL,
    "cluster_capped_sample": CLUSTER_CAPPED_SAMPLE_SQL,
    "bitext_candidates": BITEXT_CANDIDATES_SQL,
}
