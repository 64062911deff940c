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
