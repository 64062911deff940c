"""Vocabulary / readability analytics over the crawled corpus.

Reference parity: the reference's text pipeline exposes per-document
feature extraction through worker handlers and expression mappers
(`pkg/usecase/workflow.go:129-247`, `pkg/entities/expressions.go`); these
operators are the corpus-statistics queries a training-data build layers
on top of that surface — vocabulary compression under a rule stemmer and
a readability banding — re-expressed as declarative Spark plans with
DuckDB oracle twins sharing the exact SQL kernels (bit-exact integer
arithmetic, no floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.queries import T

# --------------------------------------------------------------------------
# S-stemmer (Harman 1991, "How effective is suffixing?") — the three-rule
# suffix stripper: IES→Y (unless -eies/-aies), ES→E (unless -aes/-ees/-oes),
# S→∅ (unless -us/-ss). Applied only to tokens of length ≥ 4 (documented
# choice: shorter tokens are overwhelmingly not plurals, and it keeps the
# rules total on 3-letter stopwords like "les"). The kernel is ONE shared
# SQL CASE string evaluated by Spark (F.expr) and DuckDB verbatim — only
# portable constructs (LIKE, substr, length, ||) appear in it, so the two
# engines cannot drift.
# The branch is selected by SUFFIX alone and the exception lists terminate
# it (word unchanged) rather than falling through — a flat CASE with the
# exceptions ANDed into each condition would void them (an excluded
# "goes"/"trees" would fall into the bare -s rule and lose its s anyway).
_SSTEM_CASE = """CASE
  WHEN length({c}) >= 4 AND {c} LIKE '%ies' THEN
    CASE WHEN {c} NOT LIKE '%eies' AND {c} NOT LIKE '%aies'
         THEN substr({c}, 1, length({c}) - 3) || 'y' ELSE {c} END
  WHEN length({c}) >= 4 AND {c} LIKE '%es' THEN
    CASE WHEN {c} NOT LIKE '%aes' AND {c} NOT LIKE '%ees' AND {c} NOT LIKE '%oes'
         THEN substr({c}, 1, length({c}) - 1) ELSE {c} END
  WHEN length({c}) >= 4 AND {c} LIKE '%s' THEN
    CASE WHEN {c} NOT LIKE '%us' AND {c} NOT LIKE '%ss'
         THEN substr({c}, 1, length({c}) - 1) ELSE {c} END
  ELSE {c}
END"""


def sstem_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language vocabulary compression under the S-stemmer: how many
    distinct surface forms collapse into how many stems — the quick audit
    a retrieval/tokenizer stage runs to size its vocabulary — plus each
    language's largest stem family (the stem absorbing the most surface
    forms; ties broken lexicographically).

    Scale shape: one explode → per-lang distinct (shuffle on the natural
    key) → two hash aggs; the family winner is an argmax over the tiny
    (lang, stem) aggregate, not a window over tokens. All string logic is
    whole-stage codegen (shared SQL CASE kernel, zero Python)."""
    toks = (
        T(spark, sf, "documents")
        .select("lang", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    n_tokens = toks.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_tokens"))
    vocab = (
        toks.distinct()
        .withColumn("stem", F.expr(_SSTEM_CASE.format(c="tok")))
    )
    stats = vocab.groupBy("lang").agg(
        F.countDistinct("tok").cast("bigint").alias("surface_vocab"),
        F.countDistinct("stem").cast("bigint").alias("stem_vocab"),
        (F.countDistinct("tok") - F.countDistinct("stem")).cast("bigint").alias("merged"),
    )
    families = vocab.groupBy("lang", "stem").agg(
        F.count("*").cast("bigint").alias("family_size")
    )
    # Portable argmax with a deterministic tie-break (largest family, then
    # smallest stem): rank the tiny (lang, stem) aggregate and keep rank 1.
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("family_size").desc(), F.col("stem"))
    top = (
        families.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("lang", F.col("stem").alias("top_stem"),
                F.col("family_size").alias("top_family_size"))
    )
    return (
        n_tokens.join(stats, "lang").join(top, "lang")
        .select("lang", "n_tokens", "surface_vocab", "stem_vocab", "merged",
                "top_stem", "top_family_size")
        .orderBy("lang")
    )


_SSTEM_SQL_KERNEL = _SSTEM_CASE.format(c="tok")

SSTEM_VOCAB_SQL = rf"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> length(t) > 0)) AS tok
  FROM documents
), counts AS (
  SELECT lang, count(*)::BIGINT AS n_tokens FROM toks GROUP BY lang
), vocab AS (
  SELECT DISTINCT lang, tok FROM toks
), stemmed AS (
  SELECT lang, tok, {_SSTEM_SQL_KERNEL} AS stem FROM vocab
), stats AS (
  SELECT lang,
         count(DISTINCT tok)::BIGINT AS surface_vocab,
         count(DISTINCT stem)::BIGINT AS stem_vocab,
         (count(DISTINCT tok) - count(DISTINCT stem))::BIGINT AS merged
  FROM stemmed GROUP BY lang
), families AS (
  SELECT lang, stem, count(*)::BIGINT AS family_size
  FROM stemmed GROUP BY lang, stem
), top AS (
  SELECT lang, stem AS top_stem, family_size AS top_family_size
  FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                     ORDER BY family_size DESC, stem) AS r
        FROM families)
  WHERE r = 1
)
SELECT c.lang, c.n_tokens, s.surface_vocab, s.stem_vocab, s.merged,
       t.top_stem, t.top_family_size
FROM counts c JOIN stats s USING (lang) JOIN top t USING (lang)
ORDER BY c.lang
"""


# --------------------------------------------------------------------------
# Integer Flesch-Kincaid grade banding. Classic FK grade =
# 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59; the engine
# computes grade·1000 in pure int64 floor arithmetic:
#   fk_pm = (390·W) div S + (11800·Y) div W − 15590
# with W = whitespace tokens, S = non-empty [.!?]-separated spans,
# Y = vowel-group ([aeiouy]+) matches in the lowered text (the standard
# cheap syllable proxy), all clamped ≥ 1. Floor-div per term (not of the
# sum) is the documented divergence from the float formula — identical on
# both engines, which is the contract that matters.
FK_EASY_PM = 8_000    # grade < 8.0  → 'easy'
FK_MEDIUM_PM = 12_000 # grade < 12.0 → 'medium', else 'hard'


def readability_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document integer Flesch-Kincaid grade (per-mille) and its
    difficulty band — the curriculum/quality signal a data-mixing stage
    sorts on.

    Scale shape: pure projection over the documents scan — regex kernels
    and integer arithmetic inside whole-stage codegen, zero Python, zero
    shuffle; inherits the scan's partitioning at any corpus size."""
    d = T(spark, sf, "documents")
    low = F.lower(F.col("text"))
    n_words = F.greatest(
        F.size(F.filter(F.split(low, r"\s+"), lambda t: F.length(t) > 0)), F.lit(1)
    ).cast("long")
    n_sents = F.greatest(
        F.size(F.filter(F.split(F.col("text"), r"[.!?]+"),
                        lambda s: F.length(F.trim(s)) > 0)), F.lit(1)
    ).cast("long")
    n_syll = F.greatest(
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")), F.lit(1)
    ).cast("long")
    fk = (
        F.floor(F.lit(390) * n_words / n_sents)
        + F.floor(F.lit(11800) * n_syll / n_words)
        - F.lit(15590)
    ).cast("long")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
        fk.alias("fk_pm"),
        F.when(fk < FK_EASY_PM, F.lit("easy"))
        .when(fk < FK_MEDIUM_PM, F.lit("medium"))
        .otherwise(F.lit("hard"))
        .alias("band"),
    )


READABILITY_SQL = rf"""
SELECT doc_id, n_words, n_sents, n_syll, fk_pm,
       CASE WHEN fk_pm < {FK_EASY_PM} THEN 'easy'
            WHEN fk_pm < {FK_MEDIUM_PM} THEN 'medium'
            ELSE 'hard' END AS band
FROM (
  SELECT doc_id, n_words, n_sents, n_syll,
         ((390 * n_words) // n_sents
          + (11800 * n_syll) // n_words - 15590)::BIGINT AS fk_pm
  FROM (
    SELECT doc_id,
           greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    t -> length(t) > 0)), 1)::BIGINT AS n_words,
           greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                    s -> length(trim(s)) > 0)), 1)::BIGINT AS n_sents,
           greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)::BIGINT AS n_syll
    FROM documents
  )
)
"""


QUERIES = {
    "sstem_vocab": sstem_vocab,
    "readability_bands": readability_bands,
}
ORACLES = {
    "sstem_vocab": SSTEM_VOCAB_SQL,
    "readability_bands": READABILITY_SQL,
}
