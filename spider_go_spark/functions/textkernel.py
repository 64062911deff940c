"""Vectorized text-analysis kernel: tokenization, shingling, deterministic
hashing, MinHash signatures, SimHash — all as JVM-side Catalyst expressions
(higher-order array functions), so the hot path stays inside whole-stage
codegen with zero Python.

The deterministic polynomial hash is chosen to be reproducible in ANSI SQL
(``POLY_P`` modulus keeps every intermediate within int64), which makes even
the sketch-based operators (MinHash-LSH, SimHash) verifiable value-for-value
against an external SQL oracle — the same discipline the crawl engine uses
for URL hashing (no wall-clock, no engine-private hash functions in
comparable outputs).

Reference parity note: spider-go has no text operators at all (SURVEY.md
§2.12); this module is the training-data-pipeline surface the north rule
adds on top (dedup, quality, language ID, fingerprinting) for the
interleaved text+media corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Polynomial-hash modulus: ~2^30, keeps acc*31+c < 2^35 ≪ int64 overflow in
# both Spark and any bigint SQL engine.
POLY_P = 1_000_000_007

# content-defined-chunking + unigram-tokenizer constants — they live HERE
# (session-free module) because functions/arrowkernels defines pandas_udfs
# at import time and therefore needs an active SparkSession; query modules
# must stay importable without one (driver enumerates queries() first)
CDC_W = 8  # rolling-hash window (chars)
CDC_B, CDC_P = 257, 1_000_003  # poly base / modulus
CDC_MASK = 64  # boundary when h % 64 == 0 → ~64-char average chunks
CDC_POWS = [pow(CDC_B, j, CDC_P) for j in range(CDC_W)]  # B^j mod P
UNI_NMAX = 4  # unigram tokenizer: max piece length (chars)

# MinHash permutation family: perm_i(h) = (A_i·h + B_i) mod POLY_P with
# A_i odd — pairwise-distinct affine permutations, deterministic across runs.
MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # MINHASH_K = LSH_BANDS × LSH_ROWS

SIMHASH_BITS = 30  # POLY_P < 2^30 → 30 usable bits per hash


def tokens(col: Column | str) -> Column:
    r"""Whitespace tokenization (``\s+``) with empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def poly_hash(col: Column | str) -> Column:
    """Deterministic 30-bit polynomial string hash h(s) = Σ s[i]·31^(n-i) mod P.

    Pure Catalyst (split/transform/aggregate): codegen'd, no UDF. ASCII
    inputs assumed (token vocabulary of the corpus); non-ASCII would need
    a codepoint fn on the oracle side too.
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % F.lit(POLY_P)
    )


def shingles(tokens_col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined); empty array when < k tokens."""
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(0), n - k)
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(mk)).otherwise(F.array().cast("array<string>"))


# Token-hash combiner base: shingle hash = fold of per-token hashes with
# h' = (h·COMBINE_A + tok_hash) mod P. Hashing tokens once and combining
# (instead of re-hashing every character of every overlapping shingle) cuts
# the char passes k-fold; all intermediates stay < P·COMBINE_A ≈ 2^80? no:
# (P-1)·COMBINE_A + (P-1) < 1e9·1e6 + 1e9 ≈ 1e15 ≪ 2^63 — int64-safe in any
# engine, same reproducibility contract as poly_hash.
COMBINE_A = 1_000_003


def token_hashes(text_col: Column | str) -> Column:
    """array<long> of per-token polynomial hashes.

    IMPORTANT: materialize this as a real column (one projection) before
    feeding it to :func:`combine_windows` — Catalyst does not
    common-subexpression-eliminate through higher-order-function lambdas, so
    inlining this expression into the window combiner re-evaluates the whole
    token-hash array per element access (O(n²) char hashing)."""
    return F.transform(tokens(text_col), lambda t: poly_hash(t))


def combine_windows(th_col: Column | str, k: int = 3, distinct: bool = True) -> Column:
    """Distinct k-window combined hashes over a token-hash array column:
    h = fold(h·COMBINE_A + tok_hash mod P), built from k shifted slices
    zip_with-folded together. The slice form references the th expression
    only k times (vs n·k for per-element access inside a transform lambda —
    Catalyst re-evaluates HOF-captured expressions per reference, and
    CollapseProject undoes any projection-splitting attempt).

    ``distinct=False`` keeps every window occurrence (positional
    multiplicity) — needed by frequency-style consumers (e.g. the
    repetition-quality bigram mode), where collapsing repeats would erase
    exactly the signal being measured."""
    th = F.col(th_col) if isinstance(th_col, str) else th_col
    n = F.size(th)
    win = n - (k - 1)
    mk = F.slice(th, 1, win)
    for j in range(1, k):
        mk = F.zip_with(
            mk,
            F.slice(th, j + 1, win),
            lambda h, c: (h * F.lit(COMBINE_A) + c) % F.lit(POLY_P),
        )
    if distinct:
        mk = F.array_distinct(mk)
    return F.when(n >= k, mk).otherwise(F.array().cast("array<long>"))


def line_hashes(th_col: Column | str, line_tokens: int = 8) -> Column:
    """array<long> of per-line combined hashes over a token-hash array:
    the stream is cut into consecutive NON-overlapping ``line_tokens``-token
    groups ("lines" — the corpus text carries no newlines, so the line
    boundary is a deterministic token count, same convention as the span
    synthesis in queries/mediaops.py), each folded with the shared
    h' = h·COMBINE_A + tok_hash mod P combiner. The trailing partial group
    is kept (CCNet dedups the final short paragraph too). Position matters:
    no distinct — a line repeated within a document counts each time.

    Pure HOF projection (sequence/slice/aggregate); int64-safe like
    :func:`combine_windows`, so the SQL oracle reproduces it bit-for-bit.
    """
    th = F.col(th_col) if isinstance(th_col, str) else th_col
    n_lines = F.ceil(F.size(th) / line_tokens).cast("int")
    gidx = F.when(n_lines > 0, F.sequence(F.lit(0), n_lines - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        gidx,
        lambda g: F.aggregate(
            F.slice(th, g * line_tokens + 1, line_tokens),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * F.lit(COMBINE_A) + x) % F.lit(POLY_P),
        ),
    )


def shingle_hashes(text_col: Column | str, k: int = 3) -> Column:
    """array<long> of distinct k-shingle hashes for a text column. One-shot
    convenience for small inputs/tests; pipelines should materialize
    :func:`token_hashes` first (see that docstring)."""
    return combine_windows(token_hashes(text_col), k)


def minhash_signature(hashes_col: Column, num_hashes: int = MINHASH_K) -> Column:
    """array<long> MinHash signature: sig_i = min over shingle hashes h of
    (A_i·h + B_i) mod P; P (sentinel > any hash) when the doc has no shingles."""
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(POLY_P)

    sigs = []
    for i in range(num_hashes):
        permed = F.transform(hashes_col, perm(2 * i + 1, 10_007 * i + 3))
        sigs.append(F.coalesce(F.array_min(permed), F.lit(POLY_P).cast("long")))
    return F.array(*sigs)


def lsh_band_signatures(sig_col: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """array<struct<band_id:int, band_sig:string>> — docs sharing any
    (band_id, band_sig) are near-duplicate candidates."""
    out = []
    for b in range(bands):
        parts = [F.element_at(sig_col, b * rows + r + 1).cast("string") for r in range(rows)]
        out.append(
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.concat_ws("_", *parts).alias("band_sig"),
            )
        )
    return F.array(*out)


def simhash(hashes_col: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over shingle hashes: bit j set iff Σ_s (±1 by bit j of h(s)) > 0."""
    def vote(j: int):
        return lambda a, h: a + F.when(F.shiftright(h, j) % 2 == 1, 1).otherwise(-1)

    acc = F.lit(0).cast("long")
    for j in range(bits):
        votes = F.aggregate(hashes_col, F.lit(0).cast("long"), vote(j))
        acc = acc + F.when(votes > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return acc


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long bit-vectors (JVM bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))
