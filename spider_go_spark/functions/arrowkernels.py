"""Arrow-batched (pandas_udf) sketch kernels — the map-only fast path.

Spark evaluates higher-order-function lambdas outside whole-stage codegen,
so heavy per-element fold kernels pay an interpreted lambda call per
element. SimHash's 30 bit-votes per hash lose 2× to an Arrow kernel that
does one numpy bit matrix per doc (measured warm at sf0.1: 0.33 s vs
0.69 s); MinHash's 16 cheap folds WIN against Arrow (0.4 s vs 0.8 s —
per-row list serialization into pandas costs more than the folds), so
only SimHash lives here. Exploding to rows instead would add a corpus×K
shuffle — wrong at 10^10 docs; this kernel keeps the fold form's
MAP-ONLY scale shape (plans show ArrowEvalPython, which the repo's
no-per-row-Python audit explicitly allows). Pure-integer ops keep
results bit-identical to the HOF form and the DuckDB oracles on any
partitioning.

NOTE: this module must NOT use ``from __future__ import annotations`` —
pandas_udf resolves the real pd.Series type hints at definition time.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from spider_go_spark.functions import textkernel as tk


@pandas_udf("long")
def simhash_arrow(hs: pd.Series) -> pd.Series:
    """30-bit SimHash per doc: bit j set iff the majority of shingle
    hashes have bit j set (empty set → 0, as the fold form)."""
    j = np.arange(tk.SIMHASH_BITS, dtype=np.int64)
    out = np.empty(len(hs), dtype=np.int64)
    for i, h in enumerate(hs):
        if h is None or len(h) == 0:
            # Null or empty shingle array → 0, exactly like the tk.simhash
            # fold form: aggregate over a null array yields null votes, and
            # when(null > 0, bit).otherwise(0) takes the otherwise branch,
            # so every bit contributes 0 (verified empirically — NOT null).
            out[i] = 0
            continue
        a = np.asarray(h, dtype=np.int64)
        ones = ((a[:, None] >> j) & 1).sum(axis=0)
        votes = 2 * ones - a.size
        out[i] = int(((votes > 0).astype(np.int64) << j).sum())
    return pd.Series(out)


# -- content-defined chunking ------------------------------------------------

CDC_W, CDC_P, CDC_MASK = tk.CDC_W, tk.CDC_P, tk.CDC_MASK
_CDC_POWS = np.array(tk.CDC_POWS, dtype=np.int64)


@pandas_udf("array<string>")
def cdc_chunks_arrow(texts: pd.Series) -> pd.Series:
    """Split each text at content-defined boundaries: position i (1-based)
    ends a chunk iff the trailing-window polynomial hash
    h_i = Σ_j code(c_{i-j})·B^j mod P is ≡ 0 mod CDC_MASK. The window is
    FIXED (not a running gear hash), so every position's boundary decision
    is independent — one vectorized numpy pass per doc instead of an
    interpreted Spark HOF per (position × window) element (measured: the
    HOF form cost ~80 s at sf0.01 vs <2 s here, identical values — the
    SimHash lesson again). Docs shorter than the window form one chunk;
    null/empty texts yield an empty chunk list."""
    out = []
    for text in texts:
        if not text:
            out.append([])
            continue
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        n = len(codes)
        if n < CDC_W:
            out.append([text])
            continue
        h = np.zeros(n - CDC_W + 1, dtype=np.int64)
        for j in range(CDC_W):
            h += codes[CDC_W - 1 - j : n - j] * _CDC_POWS[j]
        # h[k] is the window hash ENDING at 0-based position k + CDC_W - 1
        ends = np.nonzero((h % CDC_P) % CDC_MASK == 0)[0] + CDC_W  # 1-based end
        chunks, start = [], 0
        for e in ends:
            if e < n:
                chunks.append(text[start:e])
                start = e
        chunks.append(text[start:n])
        out.append(chunks)
    return pd.Series(out)


# -- unigram-LM Viterbi segmentation ----------------------------------------

UNI_NMAX = tk.UNI_NMAX


def make_unigram_segmenter(cost):
    """Factory for the unigram-LM Viterbi kernel (queries/pipelineops.
    unigram_viterbi_pieces): ``cost`` maps piece → integer Q20 cost
    (−log2 P in the shared fixed point); the returned pandas_udf segments
    each word to minimum total cost, ties → fewest pieces, then the
    shortest final piece (l ascending + strict <). Lives here because
    pandas_udf needs REAL pd.Series annotations — this module bans
    postponed annotations (see module docstring)."""

    @pandas_udf("array<string>")
    def segment(toks: pd.Series) -> pd.Series:
        out = []
        for tok in toks:
            n = len(tok)
            dp = [None] * (n + 1)  # dp[i] = (cost, n_pieces, pieces)
            dp[0] = (0, 0, [])
            for i in range(1, n + 1):
                best = None
                for l in range(1, min(UNI_NMAX, i) + 1):
                    prev = dp[i - l]
                    if prev is None:
                        continue
                    c = cost.get(tok[i - l : i])
                    if c is None:
                        continue
                    cand = (prev[0] + c, prev[1] + 1)
                    if best is None or cand < (best[0], best[1]):
                        best = (cand[0], cand[1], prev[2] + [tok[i - l : i]])
                dp[i] = best  # never None: every 1-gram is in the model
            out.append(dp[n][2])
        return pd.Series(out)

    return segment
