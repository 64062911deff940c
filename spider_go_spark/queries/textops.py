r"""Training-data pipeline text operators over the ``documents`` table.

Exact dedup, n-gram-Jaccard near-dup, MinHash-LSH, SimHash, token stats,
quality scoring, language ID, fingerprinting — the large-scale corpus-prep
surface (spider-go has no text ops, SURVEY.md §2.12; these are the north
rule's training-data additions).

Everything runs as JVM-side Catalyst expressions via
:mod:`spider_go_spark.functions.textkernel` (no Python in the hot path), and
— because the hash family is plain int64 arithmetic — even the sketches
(MinHash, SimHash) have value-exact SQL oracles.

Scale notes (100 TB corpus):
- per-doc ops (tokens/quality/langid/fingerprint/sketches) are
  embarrassingly parallel map stages — no shuffle at all;
- exact dedup is one hash-partitioned groupBy on md5 (uniform keys, no skew);
- pair generation never does a full cross join: n-gram and MinHash paths
  both go through an explode→equi-join on (shingle-hash | band signature),
  so the shuffle is keyed by content and AQE handles hot shingles; the
  SimHash pair query is the only quadratic one and is for small candidate
  pools (use simhash + banding at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.queries import T

# Shared SQL prefix: tokens → per-token polynomial hashes → combined
# 3-token-window hashes, mirroring textkernel.tokens/poly_hash/
# shingle_hashes exactly (tokens hashed once, windows combined with
# h' = h·1000003 + tok_hash mod P).
_HASHES_CTE = r"""
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
), hs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(th)-2, 0)),
            i -> ((th[i+1]*1000003 + th[i+2]) % 1000000007 * 1000003 + th[i+3]) % 1000000007)) AS hashes
  FROM th
)
"""

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "et", "une", "un"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "los", "una", "por", "como"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def _docs_hashes(spark: SparkSession, sf: str) -> DataFrame:
    # the corpus parquet is a single small file → one input split; the
    # shingle-hash kernel is CPU-heavy, so spread rows across all cores
    # first (at 100 TB the scan itself yields enough splits and this
    # repartition disappears behind maxPartitionBytes).
    # shingle_hashes' slice-based combiner re-evaluates the token-hash array
    # only k (=3) times per row — cheap enough to fuse into one parallel
    # projection (Catalyst re-evaluates HOF-captured expressions per
    # reference, so the per-element-access form would be O(n·k) re-evals).
    d = T(spark, sf, "documents").repartition(spark.sparkContext.defaultParallelism, "doc_id")
    h = d.select("doc_id", tk.shingle_hashes(F.col("text")).alias("hashes"))
    # second (cheap) exchange = materialization barrier: downstream sketch
    # expressions (MinHash's 16 permutations, SimHash's 30 bit-votes) each
    # reference `hashes`, and Catalyst re-evaluates HOF expressions per
    # reference within a projection — shipping the computed array through a
    # shuffle makes those references column reads instead
    return h.repartition(spark.sparkContext.defaultParallelism, "doc_id")


# --------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup: md5-keyed hash groupBy (uniform shuffle keys;
    the 100 TB-safe baseline dedup)."""
    d = T(spark, sf, "documents")
    return (
        d.withColumn("text_md5", F.md5(F.col("text")))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS first_doc_id
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
def token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, alpha-only tokens
    (BPE-ish [a-z]+ pieces), total chars. Exact ints — strict parity."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("bigint").alias("n_alpha_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).alias(
            "n_token_chars"
        ),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(tokens)::BIGINT AS n_tokens,
       len(list_distinct(tokens))::BIGINT AS n_distinct_tokens,
       len(list_filter(tokens, t -> regexp_full_match(t, '[a-z]+')))::BIGINT AS n_alpha_tokens,
       list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> length(t)::BIGINT)),
                   (a,b) -> a+b) AS n_token_chars
FROM (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
  FROM documents
)
"""


# --------------------------------------------------------------------------
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: stopword ratio + mean token length → quality band.
    Ratios are single exact-int divisions (bit-identical across engines)."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_tok = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("bigint")
    n_chars_tok = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    avg_len = F.when(n_tok > 0, n_chars_tok.cast("double") / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    band = (
        F.when((stop_ratio >= 0.05) & (avg_len >= 3.0) & (avg_len <= 8.0), F.lit("good"))
        .when((avg_len >= 2.0) & (avg_len <= 12.0), F.lit("fair"))
        .otherwise(F.lit("poor"))
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        avg_len.alias("avg_token_len"),
        band.alias("quality_band"),
    )


TEXT_QUALITY_SQL = r"""
SELECT doc_id,
       n_tokens,
       stop_ratio,
       avg_token_len,
       CASE WHEN stop_ratio >= 0.05 AND avg_token_len >= 3.0 AND avg_token_len <= 8.0 THEN 'good'
            WHEN avg_token_len >= 2.0 AND avg_token_len <= 12.0 THEN 'fair'
            ELSE 'poor' END AS quality_band
FROM (
  SELECT doc_id,
         len(tokens)::BIGINT AS n_tokens,
         CASE WHEN len(tokens) > 0 THEN
           len(list_filter(tokens, t -> list_contains(['the','a','of','and','to'], t)))::DOUBLE
             / len(tokens)::DOUBLE ELSE 0.0 END AS stop_ratio,
         CASE WHEN len(tokens) > 0 THEN
           list_reduce(list_prepend(0::BIGINT, list_transform(tokens, t -> length(t)::BIGINT)),
                       (a,b) -> a+b)::DOUBLE / len(tokens)::DOUBLE ELSE 0.0 END AS avg_token_len
  FROM (
    SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
    FROM documents
  )
)
"""


# --------------------------------------------------------------------------
def lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language ID by stopword-marker scoring with a fixed tie-break order
    (en > fr > de > es > zh)."""
    d = T(spark, sf, "documents")
    toks = tk.tokens(F.col("text"))
    def contains(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = {}
    for lg, words in _STOPWORDS.items():
        scores[lg] = F.size(F.filter(toks, contains(words))).cast("bigint")
    s = scores
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
    return d.select(
        "doc_id",
        s["en"].alias("score_en"),
        s["fr"].alias("score_fr"),
        s["de"].alias("score_de"),
        s["es"].alias("score_es"),
        s["zh"].alias("score_zh"),
        pred.alias("pred_lang"),
    )


def _score_sql(words: list[str]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return f"len(list_filter(tokens, t -> list_contains([{lst}], t)))::BIGINT"


LANG_ID_SQL = rf"""
SELECT doc_id, score_en, score_fr, score_de, score_es, score_zh,
       CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
            WHEN score_fr >= score_de AND score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
            WHEN score_de >= score_es AND score_de >= score_zh THEN 'de'
            WHEN score_es >= score_zh THEN 'es'
            ELSE 'zh' END AS pred_lang
FROM (
  SELECT doc_id,
         {_score_sql(_STOPWORDS["en"])} AS score_en,
         {_score_sql(_STOPWORDS["fr"])} AS score_fr,
         {_score_sql(_STOPWORDS["de"])} AS score_de,
         {_score_sql(_STOPWORDS["es"])} AS score_es,
         {_score_sql(_STOPWORDS["zh"])} AS score_zh
  FROM (
    SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS tokens
    FROM documents
  )
)
"""


# --------------------------------------------------------------------------
def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style fingerprint: min 3-shingle rolling hash per doc
    (-1 for docs too short to shingle)."""
    h = _docs_hashes(spark, sf)
    return h.select(
        "doc_id",
        F.coalesce(F.array_min("hashes"), F.lit(-1).cast("long")).alias("fingerprint"),
        F.size("hashes").cast("bigint").alias("n_shingles"),
    )


DOC_FINGERPRINT_SQL = (
    _HASHES_CTE
    + """
SELECT doc_id,
       coalesce(list_min(hashes), -1)::BIGINT AS fingerprint,
       len(hashes)::BIGINT AS n_shingles
FROM hs
"""
)


# --------------------------------------------------------------------------
def ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5, candidates generated by
    an explode→equi-join on shingle hash (content-keyed shuffle — never a
    cross join; this is the scale path for exact-verification of candidates).

    The shingle-hash table is materialized with an eager localCheckpoint
    (NOT persist): three plan branches read it, but no CacheManager entry is
    created, so repeated invocation leaks nothing — the checkpoint blocks
    are released by the ContextCleaner when the result is dropped."""
    h = _docs_hashes(spark, sf).localCheckpoint(eager=True)
    ex = h.select("doc_id", F.explode("hashes").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    ha = h.select(F.col("doc_id").alias("doc_id_a"), F.col("hashes").alias("hashes_a"))
    hb = h.select(F.col("doc_id").alias("doc_id_b"), F.col("hashes").alias("hashes_b"))
    joined = cand.join(ha, "doc_id_a").join(hb, "doc_id_b")
    inter = F.size(F.array_intersect("hashes_a", "hashes_b")).cast("bigint")
    union = F.size("hashes_a").cast("bigint") + F.size("hashes_b").cast("bigint") - inter
    jac = inter.cast("double") / union.cast("double")
    return joined.select(
        "doc_id_a", "doc_id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= 0.5)


NGRAM_JACCARD_PAIRS_SQL = (
    _HASHES_CTE
    + """
, ex AS (SELECT doc_id, unnest(hashes) AS h FROM hs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, jaccard FROM (
  SELECT doc_id_a, doc_id_b,
         (len(list_intersect(x.hashes, y.hashes))::DOUBLE
          / (len(x.hashes) + len(y.hashes) - len(list_intersect(x.hashes, y.hashes)))::DOUBLE) AS jaccard
  FROM cand JOIN hs x ON x.doc_id = cand.doc_id_a JOIN hs y ON y.doc_id = cand.doc_id_b
) WHERE jaccard >= 0.5
"""
)


# --------------------------------------------------------------------------
CONT_MIN_PM = 800  # emit pairs where ≥80% of a's shingles appear in b


def containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """DIRECTED near-dup pairs by shingle containment
    C(a,b) = |H_a ∩ H_b| / |H_a| ≥ CONT_MIN_PM/1000 — the asymmetric
    complement to ngram_jaccard_pairs: a short page quoted wholesale
    inside a long one has tiny Jaccard but containment ≈ 1, which is why
    dedup pipelines (Broder's original shingling paper distinguishes
    resemblance from containment) need both. Integer per-mille, no floats.

    Scale shape: identical to the Jaccard op — explode → shingle-hash
    equi-join for candidates (content-keyed shuffle, never a cross join),
    exact verification on the candidate pairs only; one eager
    localCheckpoint shared by the three plan branches."""
    h = _docs_hashes(spark, sf).localCheckpoint(eager=True)
    ex = h.select("doc_id", F.explode("hashes").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    ha = h.select(F.col("doc_id").alias("doc_id_a"), F.col("hashes").alias("hashes_a"))
    hb = h.select(F.col("doc_id").alias("doc_id_b"), F.col("hashes").alias("hashes_b"))
    inter = F.size(F.array_intersect("hashes_a", "hashes_b")).cast("bigint")
    n_a = F.size("hashes_a").cast("bigint")
    return (
        cand.join(ha, "doc_id_a")
        .join(hb, "doc_id_b")
        .filter(n_a > 0)
        .select(
            "doc_id_a",
            "doc_id_b",
            n_a.alias("n_a"),
            inter.alias("n_inter"),
            (F.lit(1000) * inter / n_a).cast("bigint").alias("containment_pm"),
        )
        .filter(F.col("containment_pm") >= CONT_MIN_PM)
    )


CONTAINMENT_PAIRS_SQL = (
    _HASHES_CTE
    + f"""
, ex AS (SELECT doc_id, unnest(hashes) AS h FROM hs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id <> b.doc_id
)
SELECT doc_id_a, doc_id_b, n_a, n_inter, containment_pm FROM (
  SELECT doc_id_a, doc_id_b,
         len(x.hashes)::BIGINT AS n_a,
         len(list_intersect(x.hashes, y.hashes))::BIGINT AS n_inter,
         (1000 * len(list_intersect(x.hashes, y.hashes)) // len(x.hashes))::BIGINT
           AS containment_pm
  FROM cand JOIN hs x ON x.doc_id = cand.doc_id_a JOIN hs y ON y.doc_id = cand.doc_id_b
  WHERE len(x.hashes) > 0
) WHERE containment_pm >= {CONT_MIN_PM}
"""
)


# --------------------------------------------------------------------------
def minhash_signature_df(h: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, sig) via the HOF fold form (textkernel.minhash_signature) —
    measured FASTER warm than the Arrow kernel at sf0.1 (0.4 s vs 0.8 s:
    16 cheap folds beat per-row list serialization into pandas; contrast
    SimHash, whose 30 bit-matrix folds lose to Arrow 2× — see
    functions/arrowkernels). Map-only either way — no shuffle at 10^10
    docs; an explode+agg formulation was tried and rejected (corpus×16
    shuffle, +60% at sf0.1)."""
    return h.select(id_col, tk.minhash_signature(F.col("hashes")).alias("sig"))


def minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands × 4 rows) candidate pairs with shared-band
    counts — the sub-quadratic near-dup path for 100 TB corpora. Docs with
    no shingles are excluded (their empty-set signatures would all collide)."""
    h = _docs_hashes(spark, sf).filter(F.size("hashes") > 0)
    sig = minhash_signature_df(h)
    bands = sig.select(
        "doc_id", F.explode(tk.lsh_band_signatures(F.col("sig"))).alias("b")
    ).select("doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_sig").alias("band_sig"))
    # materialize once: the shingle+minhash expression tree must not be
    # re-evaluated on both sides of the band self-join. Eager localCheckpoint
    # instead of persist → no CacheManager leak across invocations.
    bands = bands.localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


MINHASH_LSH_PAIRS_SQL = (
    _HASHES_CTE
    + """
, sig AS (
  SELECT doc_id,
         list_transform(range(0, 16), i ->
           coalesce(list_min(list_transform(hashes,
             h -> ((2*i+1)*h + 10007*i + 3) % 1000000007)), 1000000007)) AS sig
  FROM hs WHERE len(hashes) > 0
), bands AS (
  SELECT doc_id, band_id,
         sig[band_id*4+1]::VARCHAR || '_' || sig[band_id*4+2]::VARCHAR || '_'
           || sig[band_id*4+3]::VARCHAR || '_' || sig[band_id*4+4]::VARCHAR AS band_sig
  FROM sig, (SELECT unnest(range(0, 4)) AS band_id)
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""
)


# --------------------------------------------------------------------------
def _simhash_df(h: DataFrame) -> DataFrame:
    """(doc_id, simhash) — same integers as textkernel.simhash, computed in
    the Arrow-batched kernel (functions/arrowkernels.simhash_arrow; see
    that module for the map-only-vs-HOF rationale)."""
    from spider_go_spark.functions.arrowkernels import simhash_arrow

    return h.select("doc_id", simhash_arrow("hashes").alias("simhash"))


def simhash_values(spark: SparkSession, sf: str) -> DataFrame:
    """30-bit SimHash per doc (bitwise majority vote over shingle hashes)."""
    h = _docs_hashes(spark, sf)
    return _simhash_df(h)


SIMHASH_VALUES_SQL = (
    _HASHES_CTE
    + """
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 30), j ->
         CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(hashes,
                h -> CASE WHEN (h >> j) % 2 = 1 THEN 1::BIGINT ELSE -1::BIGINT END)),
              (a,b) -> a+b) > 0
         THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a,b) -> a+b) AS simhash
FROM hs
"""
)


SIMHASH_BANDS = 5  # 30 bits → 5 bands × 6 bits; Hamming ≤ 4 < 5 bands ⟹
# pigeonhole: at least one band is bit-identical, so a band equi-join loses
# no pair — sub-quadratic candidates with EXACT results (no recall loss)


def simhash_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ 4. Candidates come from a banded
    equi-join (pigeonhole over 5×6-bit bands — content-keyed shuffle, not a
    cross join), then the exact Hamming filter verifies.

    Selectivity caveat: on corpora with one shared vocabulary (like the
    synthetic testdata) signatures cluster and band buckets grow large —
    banding is lossless but approaches quadratic candidates there; on
    heterogeneous corpora buckets stay small and the join is sub-quadratic.
    """
    # materialize signatures once: the 30-aggregate simhash expression must
    # not be re-evaluated per band / per join side. Eager localCheckpoint
    # instead of persist → no CacheManager leak across invocations.
    s = simhash_values(spark, sf).filter(F.col("simhash") != 0).localCheckpoint(eager=True)
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("band_id"),
                        F.shiftright(F.col("simhash"), 6 * j).bitwiseAND(F.lit(63)).alias("band_bits"),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_id", "b.band_bits")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = tk.hamming64(F.col("sh_a"), F.col("sh_b")).cast("bigint")
    return cand.select("doc_id_a", "doc_id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= 4
    )


SIMHASH_NEAR_PAIRS_SQL = (
    _HASHES_CTE
    + """
, s AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 30), j ->
           CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(hashes,
                  h -> CASE WHEN (h >> j) % 2 = 1 THEN 1::BIGINT ELSE -1::BIGINT END)),
                (a,b) -> a+b) > 0
           THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a,b) -> a+b) AS simhash
  FROM hs
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE a.simhash <> 0 AND b.simhash <> 0
  AND bit_count(xor(a.simhash, b.simhash)) <= 4
"""
)


# --------------------------------------------------------------------------
def text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """The cleaning stage that runs before tokenization/dedup in a
    training-data build: lowercase, collapse whitespace runs to single
    spaces, trim, and (as the aggressive variant) drop everything but
    [a-z0-9 ]. Emits both normal forms with their lengths and the md5 of
    the aggressive form — the key exact dedup would run on post-cleaning.

    Scale shape: pure projection (built-in string kernels, whole-stage
    codegen, zero Python, zero shuffle) — the plan is a map over the scan,
    so it inherits the scan's partitioning at any corpus size."""
    d = T(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    hard = F.trim(F.regexp_replace(F.regexp_replace(norm, r"[^a-z0-9 ]", ""), r"\s+", " "))
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.length(hard).cast("bigint").alias("n_chars_hard"),
        F.md5(hard).alias("hard_md5"),
    )


TEXT_NORMALIZE_SQL = r"""
SELECT doc_id,
       norm AS norm_text,
       length(norm)::BIGINT AS n_chars_norm,
       length(hard)::BIGINT AS n_chars_hard,
       md5(hard) AS hard_md5
FROM (
  SELECT doc_id, norm,
         trim(regexp_replace(regexp_replace(norm, '[^a-z0-9 ]', '', 'g'),
                             '\s+', ' ', 'g')) AS hard
  FROM (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents
  )
)
"""


# --------------------------------------------------------------------------
_DUP_K = 5  # window width for the duplicated-n-gram signal


def dup_ngram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level duplication signal (the RefinedWeb/Gopher
    "fraction of duplicated n-grams" filter): per document, the share of
    its 5-token windows whose window hash also occurs in ANOTHER document.
    Emits (doc_id, n_windows, n_dup_windows, dup_ppm) for every doc with
    at least one full window.

    Scale shape: window hashes come from the slice-based HOF combiner
    (pure codegen, no Python); duplicated-gram discovery is one hash agg
    on the gram key (uniform by construction), and the per-doc rollup is a
    semi-join on the same key plus a doc-keyed agg. No self-join, no
    all-pairs — the same content-keyed equi-join shape the n-gram Jaccard
    candidate stage uses, so it survives a 100× corpus."""
    par = spark.sparkContext.defaultParallelism
    d = T(spark, sf, "documents").repartition(par, "doc_id")
    th = d.select("doc_id", tk.token_hashes(F.col("text")).alias("th"))
    # materialization barrier: ship the token-hash array through an
    # exchange so the window combiner reads a column, not a re-evaluated
    # HOF expression (see _docs_hashes)
    th = th.repartition(par, "doc_id")
    wins = th.select(
        "doc_id",
        F.explode(tk.combine_windows("th", _DUP_K, distinct=False)).alias("gram"),
    )
    dup_grams = (
        wins.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    totals = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows")
    )
    dups = (
        wins.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"))
    )
    return (
        totals.join(dups, "doc_id", "left")
        .fillna({"n_dup_windows": 0})
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.floor(F.col("n_dup_windows") * 1_000_000 / F.col("n_windows"))
            .cast("bigint")
            .alias("dup_ppm"),
        )
    )


# k=5 window fold, mirroring combine_windows(th, 5): h = th[i]; then
# h = (h*1000003 + th[i+j]) % P for j = 1..4
DUP_NGRAM_SQL = r"""
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
), wins AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(th)-4, 0)),
            i -> ((((((((th[i+1]*1000003 + th[i+2]) % 1000000007)
                     * 1000003 + th[i+3]) % 1000000007)
                     * 1000003 + th[i+4]) % 1000000007)
                     * 1000003 + th[i+5]) % 1000000007))) AS gram
  FROM th
), dup_grams AS (
  SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_windows FROM wins GROUP BY doc_id
), dups AS (
  SELECT w.doc_id, count(*)::BIGINT AS n_dup_windows
  FROM wins w JOIN dup_grams USING (gram)
  GROUP BY w.doc_id
)
SELECT t.doc_id, t.n_windows,
       coalesce(d.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       (coalesce(d.n_dup_windows, 0) * 1000000) // t.n_windows AS dup_ppm
FROM totals t LEFT JOIN dups d USING (doc_id)
"""


# --------------------------------------------------------------------------
def bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style corpus LM quality score: train bigram counts on the whole
    corpus, then score every document by its mean conditional bigram
    frequency — per bigram occurrence (w1, w2) the integer proxy
    p_ppm = floor(10^6 · c(w1,w2) / c(w1,·)), averaged (floor) over the
    doc's bigrams. High score = the doc's word transitions are common in
    the corpus (fluent/boilerplate); low = rare transitions (garbled or
    novel text). Emits (doc_id, n_bigrams, lm_score_ppm) for docs with ≥ 2
    tokens. Integer arithmetic end-to-end → value-exact cross-engine.

    Scale shape (10^9 docs): bigram extraction is the slice/zip_with window
    combiner (pure codegen); the count model is ONE hash agg keyed by the
    bigram hash (uniform keys — map-side partials absorb hot bigrams, the
    classic word-count shape); scoring re-joins docs' bigrams to the model
    on the same content key. No all-pairs, no broadcast of the model
    needed (equi-join; AQE may still choose broadcast when the vocabulary
    is small). The bigram stream is derived three times (occurrences,
    counts, scoring) — at scale persist/checkpoint it once; here the
    lineage recompute is cheaper than a cache round-trip."""
    par = spark.sparkContext.defaultParallelism
    d = T(spark, sf, "documents").repartition(par, "doc_id")
    th = d.select("doc_id", tk.token_hashes(F.col("text")).alias("th"))
    # materialization barrier (see token_hashes docstring): ship th through
    # an exchange so the slice combiner reads a column, not a re-evaluated
    # HOF expression
    th = th.repartition(par, "doc_id").filter(F.size("th") >= 2)
    big = th.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("th"), 1, F.size("th") - 1).alias("w1"),
                tk.combine_windows("th", 2, distinct=False).alias("g"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.g").alias("g"))
    c2 = big.groupBy("w1", "g").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        big.join(c2, ["w1", "g"])
        .join(c1, "w1")
        .select("doc_id", F.expr("(1000000 * c2) div c1").alias("p_ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.expr("sum(p_ppm) div count(1)").cast("bigint").alias("lm_score_ppm"),
    )


# bigram hash g = (th[i]·1000003 + th[i+1]) mod P — combine_windows(th, 2)
BIGRAM_LM_SQL = r"""
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
), big AS (
  -- range() here is the LIST function (column args allowed), not the
  -- lateral table function (column args rejected by the 1.0 binder);
  -- the two unnests zip positionally
  SELECT doc_id,
         unnest(list_transform(range(1, len(th)), i -> th[i])) AS w1,
         unnest(list_transform(range(1, len(th)),
                i -> (th[i]*1000003 + th[i+1]) % 1000000007)) AS g
  FROM th WHERE len(th) >= 2
), c2 AS (
  SELECT w1, g, count(*)::BIGINT AS c2 FROM big GROUP BY w1, g
), c1 AS (
  SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY w1
), scored AS (
  SELECT b.doc_id, (1000000 * c2.c2) // c1.c1 AS p_ppm
  FROM big b JOIN c2 USING (w1, g) JOIN c1 USING (w1)
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       (sum(p_ppm) // count(*))::BIGINT AS lm_score_ppm
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# BPE-ish pre-tokenization classes — the GPT-2 pattern reduced to what Java
# regex (Spark) and RE2 (DuckDB) match identically: letter runs, digit runs,
# and non-space-non-alnum (punct) runs. No lookahead (RE2 has none).
_BPE_WORD = "[A-Za-z]+"
_BPE_NUM = "[0-9]+"
_BPE_PUNCT = "[^\\sA-Za-z0-9]+"
_BPE_ALL = f"{_BPE_WORD}|{_BPE_NUM}|{_BPE_PUNCT}"


def bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer (the GPT-2 regex family
    restricted to its lookahead-free core): per document, the number of
    letter-run / digit-run / punctuation-run pieces — the budget estimate a
    training pipeline uses before paying for a real tokenizer pass
    (whitespace counting over-merges 'foo,bar' and under-counts CJK-style
    punctuation-dense text). Emits (doc_id, n_pieces, n_word_pieces,
    n_num_pieces, n_punct_pieces).

    Scale shape: a pure projection over the text column — regexp counting
    inside whole-stage codegen, no Python, no shuffle."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_ALL)).cast("bigint").alias("n_pieces"),
        F.regexp_count("text", F.lit(_BPE_WORD)).cast("bigint").alias("n_word_pieces"),
        F.regexp_count("text", F.lit(_BPE_NUM)).cast("bigint").alias("n_num_pieces"),
        F.regexp_count("text", F.lit(_BPE_PUNCT)).cast("bigint").alias("n_punct_pieces"),
    )


BPE_TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_ALL}'))::BIGINT AS n_pieces,
       len(regexp_extract_all(text, '{_BPE_WORD}'))::BIGINT AS n_word_pieces,
       len(regexp_extract_all(text, '{_BPE_NUM}'))::BIGINT AS n_num_pieces,
       len(regexp_extract_all(text, '{_BPE_PUNCT}'))::BIGINT AS n_punct_pieces
FROM documents
"""


# --------------------------------------------------------------------------
# PII scrubbing — regex redaction stage of a training-data pipeline.
# Patterns restricted to what Java regex (Spark) and RE2 (DuckDB) match
# identically: no lookaround, greedy character classes only.
# --------------------------------------------------------------------------

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction: replace email addresses and international-format phone
    numbers with <EMAIL>/<PHONE> placeholders and count redactions per doc.
    The synthetic corpus contains no organic PII, so the stage's input is a
    deterministic augmentation (a contact line derived from doc_id/source/
    n_chars appended to the text) — the regexes are genuinely exercised and
    the md5 of the scrubbed text value-verifies the exact replacement
    behavior cross-engine. Emits (doc_id, n_emails, n_phones, clean_len,
    clean_md5).

    Scale shape: pure projection — regexp count/replace inside whole-stage
    codegen, no Python, no shuffle; at 100 TB this pins at scan speed."""
    d = T(spark, sf, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.test or call +1-555-"),
        F.lpad(F.pmod(F.col("n_chars"), F.lit(10000)).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(synth, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(synth, F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(synth, F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.length(scrubbed).cast("bigint").alias("clean_len"),
        F.md5(scrubbed).alias("clean_md5"),
    )


PII_SCRUB_SQL = (
    """
WITH s AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@' || source
              || '.example.test or call +1-555-'
              || lpad((n_chars % 10000)::VARCHAR, 4, '0') AS synth
  FROM documents
), r AS (
  SELECT doc_id, synth,
         regexp_replace(regexp_replace(synth, '"""
    + _PII_EMAIL
    + """', '<EMAIL>', 'g'), '"""
    + _PII_PHONE
    + """', '<PHONE>', 'g') AS scrubbed
  FROM s
)
SELECT doc_id,
       len(regexp_extract_all(synth, '"""
    + _PII_EMAIL
    + """'))::BIGINT AS n_emails,
       len(regexp_extract_all(synth, '"""
    + _PII_PHONE
    + """'))::BIGINT AS n_phones,
       length(scrubbed)::BIGINT AS clean_len,
       md5(scrubbed) AS clean_md5
FROM r
"""
)


# --------------------------------------------------------------------------
# Trigram Stupid Backoff LM score — the scale-era LM quality signal
# (Brants et al. 2007, "Large Language Models in Machine Translation"):
# no discounting/normalization, just relative frequencies with a fixed
# backoff multiplier — exactly the estimator that stays exact in integer
# arithmetic. The model trains on HALF the corpus (even doc_id) and scores
# every document, so the backoff chain is genuinely exercised by held-out
# docs (training and scoring on the same corpus would make every trigram
# "seen" and the backoff branch dead code).
# --------------------------------------------------------------------------

SBO_P = 1_000_000_007
SBO_A = 1_000_003
# backoff multiplier 0.4 per level, pre-scaled into exact ppm numerators:
# level1 = 10^6·c3/c12, level2 = 0.4·10^6·c23/c2, level3 = 0.16·10^6·c3u/N
SBO_L1 = 1_000_000
SBO_L2 = 400_000
SBO_L3 = 160_000


def trigram_sbo_score(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_trigrams, sbo_score_ppm) for docs with ≥ 3 tokens: the
    mean (floor) Stupid-Backoff score over the doc's trigram occurrences,
    against a trigram/bigram/unigram count model trained on even-doc_id
    documents. All counts and scores are exact integers (ppm).

    Scale shape (10^9 docs): the three model tables are word-count-shaped
    hash aggs on uniform content hashes (map-side partials absorb hot
    n-grams); scoring is four equi-joins from the occurrence stream to the
    models on those same content keys — no broadcast required (AQE picks
    one when the vocab is small), no windows, no all-pairs. The unigram
    total N is one scalar collected once and inlined (bounded driver
    data, same convention as the inlined centroids in vectorops)."""
    par = spark.sparkContext.defaultParallelism
    d = T(spark, sf, "documents").repartition(par, "doc_id")
    th = d.select("doc_id", tk.token_hashes(F.col("text")).alias("th"))
    # four consumers (tri occurrences + the three model builds) — tokenize
    # once, eagerly, instead of four lineage recomputes of the hash kernel
    th = th.localCheckpoint(eager=True)

    tri_expr = F.expr(
        f"transform(sequence(1, size(th) - 2), i -> struct("
        f"(element_at(th, i) * {SBO_A} + element_at(th, i + 1)) % {SBO_P} AS h12,"
        f"(element_at(th, i + 1) * {SBO_A} + element_at(th, i + 2)) % {SBO_P} AS h23,"
        f"(((element_at(th, i) * {SBO_A} + element_at(th, i + 1)) % {SBO_P})"
        f" * {SBO_A} + element_at(th, i + 2)) % {SBO_P} AS h123,"
        f"element_at(th, i + 1) AS w2, element_at(th, i + 2) AS w3))"
    )
    tri = (
        th.filter(F.size("th") >= 3)
        .select("doc_id", F.explode(tri_expr).alias("t"))
        .select("doc_id", "t.h12", "t.h23", "t.h123", "t.w2", "t.w3")
    )

    train = th.filter(F.col("doc_id") % 2 == 0)
    uni = train.select(F.explode("th").alias("w"))
    big_expr = F.expr(
        f"transform(sequence(1, size(th) - 1), i -> "
        f"(element_at(th, i) * {SBO_A} + element_at(th, i + 1)) % {SBO_P})"
    )
    big = train.filter(F.size("th") >= 2).select(F.explode(big_expr).alias("h"))
    tri3 = train.filter(F.size("th") >= 3).select("doc_id", tri_expr.alias("ts")) \
        .select(F.explode("ts").alias("t")).select(F.col("t.h123").alias("h"))

    m3 = tri3.groupBy("h").agg(F.count(F.lit(1)).alias("c3"))
    m2 = big.groupBy("h").agg(F.count(F.lit(1)).alias("c2"))
    m1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    n_train = uni.count()  # scalar, inlined as a literal

    j = (
        tri.join(m3.withColumnRenamed("h", "h123"), "h123", "left")
        .join(m2.select(F.col("h").alias("h12"), F.col("c2").alias("c12")), "h12", "left")
        .join(m2.select(F.col("h").alias("h23"), F.col("c2").alias("c23")), "h23", "left")
        .join(m1.select(F.col("w").alias("w2"), F.col("c1").alias("cw2")), "w2", "left")
        .join(m1.select(F.col("w").alias("w3"), F.col("c1").alias("cw3")), "w3", "left")
    )
    s = F.expr(
        f"CASE WHEN c3 IS NOT NULL THEN ({SBO_L1} * c3) div c12 "
        f"WHEN c23 IS NOT NULL THEN ({SBO_L2} * c23) div cw2 "
        f"ELSE ({SBO_L3} * coalesce(cw3, 0)) div {max(n_train, 1)} END"
    )
    return (
        j.select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.expr("sum(s) div count(1)").cast("bigint").alias("sbo_score_ppm"),
        )
    )


def _sbo_sql() -> str:
    th_cte = r"""
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
)"""
    return (
        th_cte
        + f""", tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(th) - 1), i -> (th[i]*{SBO_A} + th[i+1]) % {SBO_P})) AS h12,
         unnest(list_transform(range(1, len(th) - 1), i -> (th[i+1]*{SBO_A} + th[i+2]) % {SBO_P})) AS h23,
         unnest(list_transform(range(1, len(th) - 1),
                i -> (((th[i]*{SBO_A} + th[i+1]) % {SBO_P}) * {SBO_A} + th[i+2]) % {SBO_P})) AS h123,
         unnest(list_transform(range(1, len(th) - 1), i -> th[i+1])) AS w2,
         unnest(list_transform(range(1, len(th) - 1), i -> th[i+2])) AS w3
  FROM th WHERE len(th) >= 3
), train AS (
  SELECT * FROM th WHERE doc_id % 2 = 0
), uni AS (
  SELECT unnest(th) AS w FROM train
), m1 AS (
  SELECT w, count(*)::BIGINT AS c1 FROM uni GROUP BY w
), m2 AS (
  SELECT h, count(*)::BIGINT AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(th)), i -> (th[i]*{SBO_A} + th[i+1]) % {SBO_P})) AS h
    FROM train WHERE len(th) >= 2
  ) GROUP BY h
), m3 AS (
  SELECT h123 AS h, count(*)::BIGINT AS c3 FROM (
    SELECT unnest(list_transform(range(1, len(th) - 1),
           i -> (((th[i]*{SBO_A} + th[i+1]) % {SBO_P}) * {SBO_A} + th[i+2]) % {SBO_P})) AS h123
    FROM train WHERE len(th) >= 3
  ) GROUP BY h123
), n_train AS (
  SELECT greatest(count(*), 1)::BIGINT AS n FROM uni
), scored AS (
  SELECT t.doc_id,
         CASE WHEN m3.c3 IS NOT NULL THEN ({SBO_L1} * m3.c3) // b12.c2
              WHEN b23.c2 IS NOT NULL THEN ({SBO_L2} * b23.c2) // u2.c1
              ELSE ({SBO_L3} * coalesce(u3.c1, 0)) // (SELECT n FROM n_train) END AS s
  FROM tri t
  LEFT JOIN m3 ON m3.h = t.h123
  LEFT JOIN m2 b12 ON b12.h = t.h12
  LEFT JOIN m2 b23 ON b23.h = t.h23
  LEFT JOIN m1 u2 ON u2.w = t.w2
  LEFT JOIN m1 u3 ON u3.w = t.w3
)
SELECT doc_id, count(*)::BIGINT AS n_trigrams,
       (sum(s) // count(*))::BIGINT AS sbo_score_ppm
FROM scored GROUP BY doc_id
"""
    )


TRIGRAM_SBO_SQL = _sbo_sql()


QUERIES = {
    "trigram_sbo_score": trigram_sbo_score,
    "dedup_exact": dedup_exact,
    "token_stats": token_stats,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "containment_pairs": containment_pairs,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_values": simhash_values,
    "simhash_near_pairs": simhash_near_pairs,
    "text_normalize": text_normalize,
    "dup_ngram_fraction": dup_ngram_fraction,
    "bigram_lm_score": bigram_lm_score,
    "bpe_token_count": bpe_token_count,
    "pii_scrub": pii_scrub,
}

ORACLES = {
    "trigram_sbo_score": TRIGRAM_SBO_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "lang_id": LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_PAIRS_SQL,
    "containment_pairs": CONTAINMENT_PAIRS_SQL,
    "minhash_lsh_pairs": MINHASH_LSH_PAIRS_SQL,
    "simhash_values": SIMHASH_VALUES_SQL,
    "simhash_near_pairs": SIMHASH_NEAR_PAIRS_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "dup_ngram_fraction": DUP_NGRAM_SQL,
    "bigram_lm_score": BIGRAM_LM_SQL,
    "bpe_token_count": BPE_TOKEN_COUNT_SQL,
    "pii_scrub": PII_SCRUB_SQL,
}
