"""Scalable deterministic global ranking.

Spark gives no implicit row order (the reference gets its order for free
from NATS FIFO delivery — /root/reference/pkg/spider/nats.go:196); every
ordering-bearing output of this engine carries an explicit total sort key.

``global_rank`` assigns 1-based dense global ranks under a total order
WITHOUT a single-reducer window: range-repartition on the sort keys, sort
within partitions, then add per-partition offsets computed from partition
counts (one tiny driver-side collect of ≤ num_partitions rows).

Determinism: the range partitioner's sampled boundaries may vary between
runs, but ranks depend only on the total order, so as long as the sort keys
are a STRICT total order (callers must include a unique tiebreaker, e.g.
``url_norm``), the output rank per row is bit-stable across runs and
parallelism levels. Verified by tests at local[2] vs local[8].
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` = 1-based global rank under ``order`` (a strict total
    order). Scales to arbitrarily large inputs: no global shuffle to one
    partition, only a partition-count collect on the driver."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ordered = df.repartitionByRange(num_partitions, *order).sortWithinPartitions(*order)
    with_pid = ordered.withColumn("__pid", F.spark_partition_id())
    # Pin the sampled range boundaries: the count job and the rank job must
    # see the SAME partitioning, so materialize once before counting.
    with_pid = with_pid.persist()
    counts = {r["__pid"]: r["cnt"] for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)
    from pyspark.sql import types as T

    # copy the fields — StructType.add on df.schema mutates the df's cache
    out_schema = T.StructType(
        list(with_pid.schema.fields) + [T.StructField(rank_col, T.LongType(), False)]
    )

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{rank_col: pd.Series([], dtype="int64")})
                continue
            pid = int(pdf["__pid"].iloc[0])
            start = boff.value.get(pid, 0) + seen
            seen += len(pdf)
            yield pdf.assign(**{rank_col: range(start + 1, start + 1 + len(pdf))})

    # materialize the ranked result, then release the internal cache —
    # otherwise every call leaks one CacheManager entry (with_pid) that the
    # caller can never unpersist
    out = with_pid.mapInPandas(add_rank, out_schema).drop("__pid").persist()
    out.count()
    with_pid.unpersist()
    return out
