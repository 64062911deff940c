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
    the raw token stream. Bigrams travel as int64 combined token hashes
    (textkernel.combine_windows, multiplicity kept), not strings: the
    frequency shuffle carries 8-byte keys instead of raw bigram text, and
    the oracle runs the identical hash arithmetic so a (vanishingly rare)
    in-doc collision changes both engines identically."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    base = (
        d.withColumn("__toks", toks)
        .withColumn("__th", F.transform("__toks", lambda t: tk.poly_hash(t)))
        .select(
            "doc_id",
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("__toks")).cast("bigint").alias("__n_distinct"),
            tk.combine_windows("__th", k=2, distinct=False).alias("__bigrams"),
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
th AS (
  SELECT doc_id, tokens,
         list_transform(tokens,
            t -> list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> unicode(c)::BIGINT)),
                   (a, b) -> (a*31 + b) % 1000000007)) AS th
  FROM toks
),
base AS (
  SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
         len(list_distinct(tokens))::BIGINT AS n_distinct,
         CASE WHEN len(tokens) >= 2
              THEN list_transform(range(0, len(th) - 1),
                                  i -> (th[i+1]*1000003 + th[i+2]) % 1000000007)
              ELSE [] END AS bigrams
  FROM th
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


# --------------------------------------------------------------------------
# Histogram-based approximate quantiles
# --------------------------------------------------------------------------

_HIST_BINS = 64
_Q_PPM = (500_000, 950_000, 990_000)  # p50 / p95 / p99


def histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate p50/p95/p99 of ``events.value`` from a fixed 64-bin
    histogram — the scale path for quantiles: two cheap aggregations (a
    3-value min/max/count pass, then a 64-cell map-side-combined histogram)
    instead of the exact percentile's full sort. The estimate is the upper
    edge of the first bin whose cumulative count reaches ceil(q*N).

    All arithmetic is integer (values in floor-micro units, bin index and
    edges by integer division), so the result value-hashes exactly against
    the DuckDB oracle."""
    e = T(spark, sf, "events")
    v = e.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v_us")
    )
    s = v.agg(
        F.min("v_us").alias("mn"), F.max("v_us").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    binned = v.crossJoin(F.broadcast(s)).select(
        F.least(
            F.lit(_HIST_BINS - 1),
            F.expr(f"(v_us - mn) * {_HIST_BINS} div (mx - mn + 1)"),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # cumulative counts WITHOUT an unpartitioned running-sum window (which
    # would force an Exchange SinglePartition): the histogram is ≤64 rows,
    # so a broadcast triangular self-join (≤64² pairs) computes every
    # prefix sum with no single-partition stage anywhere in the plan
    hist = hist.localCheckpoint(eager=True)  # one histogram pass feeds both sides
    hc = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")), F.expr("b.bin <= a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(F.sum("b.c").cast("bigint").alias("cum"))
    )
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _Q_PPM])).alias("q_ppm")
    )
    t = q.crossJoin(F.broadcast(s)).withColumn(
        "thr", F.expr("(q_ppm * n_total + 999999) div 1000000")
    )
    pick = (
        t.join(F.broadcast(hc), F.col("cum") >= F.col("thr"))
        .groupBy("q_ppm", "mn", "mx", "n_total", "thr")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        pick.join(F.broadcast(hc), "bin")
        .select(
            "q_ppm",
            "bin",
            F.expr(f"mn + (((bin + 1) * (mx - mn + 1)) div {_HIST_BINS}) - 1").alias(
                "est_hi_us"
            ),
            F.col("cum").alias("n_le"),
            "n_total",
        )
    )


HISTOGRAM_QUANTILES_SQL = f"""
WITH v AS (
  SELECT CAST(floor(value * 1000000) AS BIGINT) AS v_us
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
s AS (SELECT min(v_us) AS mn, max(v_us) AS mx, count(*)::BIGINT AS n_total FROM v),
b AS (SELECT least({_HIST_BINS - 1}, ((v_us - mn) * {_HIST_BINS}) // (mx - mn + 1)) AS bin FROM v, s),
h AS (SELECT bin, count(*)::BIGINT AS c FROM b GROUP BY bin),
hc AS (SELECT bin, c, sum(c) OVER (ORDER BY bin)::BIGINT AS cum FROM h),
q AS (SELECT unnest([{", ".join(str(p) for p in _Q_PPM)}]) AS q_ppm),
t AS (SELECT q_ppm, (q_ppm * n_total + 999999) // 1000000 AS thr, mn, mx, n_total FROM q, s),
pick AS (
  SELECT t.q_ppm, t.mn, t.mx, t.n_total, min(hc.bin) AS bin
  FROM t JOIN hc ON hc.cum >= t.thr
  GROUP BY t.q_ppm, t.mn, t.mx, t.n_total
)
SELECT p.q_ppm, p.bin,
       p.mn + (((p.bin + 1) * (p.mx - p.mn + 1)) // {_HIST_BINS}) - 1 AS est_hi_us,
       hc.cum AS n_le,
       p.n_total
FROM pick p JOIN hc ON hc.bin = p.bin
"""


# --------------------------------------------------------------------------
# HLL audience overlap between event types
# --------------------------------------------------------------------------


def hll_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Estimated distinct-user overlap between every pair of event types,
    via HLL inclusion-exclusion over register-max union sketches (the
    "how much do these two segments' audiences intersect" question that
    exact distinct self-joins can't answer at 100 TB) — exact overlap
    alongside to document the sketch error. One register aggregation over
    the data; all pair math runs on ≤ groups·64 register rows."""
    return sketches.hll_pair_intersection(T(spark, sf, "events"), "user_id", "event_type")


HLL_AUDIENCE_OVERLAP_SQL = sketches.hll_pair_oracle_sql("events", "user_id", "event_type")


# --------------------------------------------------------------------------
# hll_cumulative_users — the MERGE property on display: per tumbling week,
# the distinct-user estimate over the PREFIX (all weeks so far), computed
# by register-wise max of the weekly sketches — never by rescanning
# history. This is exactly how a 100-TB pipeline keeps "distinct users to
# date": store 64 integers per window, merge by max. The register stream
# is windows × 64 rows, so the prefix-merge window function is O(windows)
# per bucket — cost independent of event volume.
# --------------------------------------------------------------------------

HLL_WEEK_US = 7 * 86400 * 1_000_000


def hll_cumulative_users(spark: SparkSession, sf: str) -> DataFrame:
    """(week, hll_prefix_est, n_registers_used, exact_prefix_distinct) —
    per week: the HLL estimate of distinct users in ALL weeks ≤ this one,
    from prefix-merged (running-max) registers over a dense week×bucket
    grid (a week without traffic in a bucket inherits the earlier
    registers), plus the exact prefix count documenting sketch error."""
    from pyspark.sql.window import Window

    e = T(spark, sf, "events").select(
        # integer `div` (≡ DuckDB `//`): parity contract stays integral
        F.expr(f"unix_micros(cast(ts as timestamp)) div {HLL_WEEK_US}")
        .cast("long").alias("week"),
        "user_id",
    )
    regs = (
        e.select(
            "week",
            sketches.hll_bucket(F.col("user_id")).alias("b"),
            sketches.hll_rho(F.col("user_id")).alias("rho"),
        )
        .groupBy("week", "b")
        .agg(F.max("rho").alias("m"))
    )
    grid = (
        e.select("week").distinct()
        .crossJoin(spark.range(sketches.HLL_M).select(F.col("id").cast("long").alias("b")))
    )
    w = Window.partitionBy("b").orderBy("week").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    merged = (
        grid.join(regs, ["week", "b"], "left")
        .withColumn("pm", F.max("m").over(w))  # running register max; null = empty
    )
    reg_val = F.expr(
        f"CASE WHEN pm IS NULL THEN shiftleft(cast(1 as bigint), {sketches.HLL_RANK_CAP})"
        f" ELSE shiftleft(cast(1 as bigint), {sketches.HLL_RANK_CAP} - pm) END"
    )
    est = (
        merged.select("week", reg_val.alias("rv"), F.col("pm").isNotNull().cast("int").alias("used"))
        .groupBy("week")
        .agg(F.sum("rv").alias("s"), F.sum("used").cast("int").alias("n_registers_used"))
        .withColumn("hll_prefix_est", F.expr(f"{sketches.HLL_NUM} div (1000 * s)"))
    )
    news = (
        e.select("week", "user_id").distinct()
        .groupBy("user_id").agg(F.min("week").alias("week"))
        .groupBy("week").agg(F.count(F.lit(1)).alias("new_users"))
    )
    # running sum over ALL weeks (a week with no first-time users still
    # carries the running total forward) — as a broadcast triangular
    # self-join over the tiny distinct-week dimension, NOT an unpartitioned
    # running-sum window (no Exchange SinglePartition in the plan)
    news = news.localCheckpoint(eager=True)  # tiny; feeds the triangular join
    exact = (
        e.select("week").distinct().alias("a")
        .join(F.broadcast(news.alias("b")), F.expr("b.week <= a.week"), "left")
        .groupBy(F.col("a.week").alias("week"))
        .agg(
            F.coalesce(F.sum("b.new_users"), F.lit(0))
            .cast("bigint")
            .alias("exact_prefix_distinct")
        )
    )
    return est.join(exact, "week").select(
        "week", "hll_prefix_est", "n_registers_used", "exact_prefix_distinct"
    )


def _hll_cumulative_sql() -> str:
    a = sketches.CMS_AS[0]
    P, M = sketches.HASH_P, sketches.HLL_M
    CAP, RB = sketches.HLL_RANK_CAP, sketches.HLL_RANK_BITS
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // {HLL_WEEK_US} AS week, user_id FROM events
), hashed AS (
  SELECT week,
         (((user_id % {P}) * {a}) % {P}) % {M} AS b,
         (((user_id % {P}) * {a}) % {P}) // {M} AS w
  FROM e
), rho AS (
  SELECT week, b,
         coalesce(
           (SELECT min(k.k) + 1 FROM (SELECT unnest(range(0, {RB})) AS k) k
            WHERE (w // (1::BIGINT << k.k)) % 2 = 1),
           {CAP}) AS rho
  FROM hashed
), regs AS (
  SELECT week, b, max(rho) AS m FROM rho GROUP BY week, b
), grid AS (
  SELECT wk.week, g.b
  FROM (SELECT DISTINCT week FROM e) wk
  CROSS JOIN (SELECT unnest(range(0, {M})) AS b) g
), merged AS (
  SELECT grid.week, grid.b,
         max(regs.m) OVER (PARTITION BY grid.b ORDER BY grid.week
                           ROWS UNBOUNDED PRECEDING) AS pm
  FROM grid LEFT JOIN regs ON regs.week = grid.week AND regs.b = grid.b
), agg AS (
  SELECT week,
         sum(CASE WHEN pm IS NULL THEN 1::BIGINT << {CAP}
                  ELSE 1::BIGINT << ({CAP} - pm) END)::BIGINT AS s,
         sum(CASE WHEN pm IS NULL THEN 0 ELSE 1 END)::INT AS n_registers_used
  FROM merged GROUP BY week
), news AS (
  SELECT week, count(*) AS new_users FROM (
    SELECT user_id, min(week) AS week FROM e GROUP BY user_id
  ) GROUP BY week
), exact AS (
  SELECT wk.week,
         sum(coalesce(news.new_users, 0)) OVER (ORDER BY wk.week
             ROWS UNBOUNDED PRECEDING)::BIGINT AS exact_prefix_distinct
  FROM (SELECT DISTINCT week FROM e) wk LEFT JOIN news USING (week)
)
SELECT agg.week, {sketches.HLL_NUM} // (1000 * s) AS hll_prefix_est,
       n_registers_used, exact.exact_prefix_distinct
FROM agg JOIN exact ON exact.week = agg.week
"""


HLL_CUMULATIVE_USERS_SQL = _hll_cumulative_sql()


QUERIES = {
    "hll_cumulative_users": hll_cumulative_users,
    "hll_distinct_users": hll_distinct_users,
    "hll_audience_overlap": hll_audience_overlap,
    "heavy_hitters_cms": heavy_hitters_cms,
    "tfidf_top_terms": tfidf_top_terms,
    "repetition_quality": repetition_quality,
    "stratified_sample": stratified_sample,
    "histogram_quantiles": histogram_quantiles,
}

ORACLES = {
    "hll_cumulative_users": HLL_CUMULATIVE_USERS_SQL,
    "hll_distinct_users": HLL_DISTINCT_USERS_SQL,
    "hll_audience_overlap": HLL_AUDIENCE_OVERLAP_SQL,
    "heavy_hitters_cms": HEAVY_HITTERS_CMS_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "repetition_quality": REPETITION_QUALITY_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "histogram_quantiles": HISTOGRAM_QUANTILES_SQL,
}
