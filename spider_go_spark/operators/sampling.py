"""Deterministic hash-based sampling for training-data pipelines:
train/val/test splits, weighted corpus mixing, and sequence packing.

Random sampling is useless for a 100 TB corpus pipeline: splits must be
(a) reproducible across runs and engines, (b) stable under re-partitioning
and incremental appends (a document's split never changes when the corpus
grows), and (c) computable as a pure map-side projection — no shuffle, no
global state. All three follow from keying the decision on a deterministic
hash of the record id:

    bucket(id) = ((id mod P) · A mod P) mod 1000

with P = 1e9+7 (int64-safe: (P-1)·A < 2^62) and A a fixed odd multiplier.
The same arithmetic runs verbatim in ANSI SQL, so every sampling decision
is value-checkable against a DuckDB oracle — same discipline as the text
sketches in :mod:`spider_go_spark.functions.textkernel`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_P = 1_000_000_007
HASH_A = 2_654_435_761  # Knuth multiplicative constant, odd
BUCKETS = 1000


def id_bucket(col: Column | str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id — map-only,
    engine-reproducible (see module docstring for the overflow argument)."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c % HASH_P) * F.lit(HASH_A) % HASH_P % buckets).cast("int")


def id_bucket_sql(expr: str, buckets: int = BUCKETS) -> str:
    """The identical bucket arithmetic as an ANSI-SQL fragment."""
    return f"(((({expr}) % {HASH_P}) * {HASH_A}) % {HASH_P}) % {buckets}"


def hash_split(
    df: DataFrame, key: str, train_ppt: int = 800, val_ppt: int = 100
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') by hash bucket:
    [0, train) → train, [train, train+val) → val, rest → test. Pure
    projection; a row's split is a function of its id alone."""
    b = id_bucket(key)
    return df.withColumn(
        "split",
        F.when(b < train_ppt, "train")
        .when(b < train_ppt + val_ppt, "val")
        .otherwise("test"),
    )


def weighted_mix(df: DataFrame, key: str, weight_ppt: Column) -> DataFrame:
    """Deterministic weighted downsampling: keep a row iff
    ``bucket(key) < weight_ppt`` (weight in parts-per-thousand, may be a
    per-row expression, e.g. per-source mixture weights). Map-only filter —
    pushes to the scan; resampling with a different mixture never reshuffles.
    """
    return df.filter(id_bucket(key) < weight_ppt)


def pack_bins(
    df: DataFrame, part_col: str, order_col: str, size_col: str, budget: int
) -> DataFrame:
    """Greedy in-order sequence packing: within each ``part_col`` stream,
    rows ordered by ``order_col`` are packed into bins of ``budget`` size
    units; ``bin_id = floor(preceding-cumulative-size / budget)``.

    This is the "first-fit in arrival order with spill" packing: one window
    cumsum per partition (a single shuffle on part_col), fully deterministic
    and SQL-expressible — unlike best-fit packing, which needs a sequential
    scan per bin and cannot parallelize. Oversized rows (> budget) still get
    a bin (their own, plus spill) rather than being dropped — filter first
    if truncation is wanted.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    # integer division (div), not floating /: cumulative sizes past 2^53
    # would lose exactness in a double quotient
    return (
        df.withColumn("__cum_prev", cum_prev)
        .withColumn("bin_id", F.expr(f"__cum_prev div {int(budget)}"))
        .drop("__cum_prev")
    )
