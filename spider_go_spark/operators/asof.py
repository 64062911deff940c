"""As-of (backward temporal) join as a single-shuffle window plan.

The reference engine has no temporal join (SURVEY.md §2.12: "no SQL joins
beyond per-message lookups"), but every event-log workload built on top of
a crawl/ingest pipeline needs one ("which was the last config change before
this fetch?", "last click before this error"). The classic Spark rendering
is a union + `last(..., ignorenulls=True)` running window:

- both sides are tagged and unioned on the equality keys,
- one shuffle partitions by the keys and sorts by (ts, side),
- a running ``last`` over the right-side payload struct gives every left
  row the most recent right row with ``right_ts <= left_ts``.

That is O(n log n) per key with exactly ONE exchange and no join explosion
— at 100 TB the alternative (equi-join + per-pair filtering) is quadratic
per hot key, while this plan's cost is bounded by the sort. Ties
(``left_ts == right_ts``) match the right row (inclusive semantics, the
same contract as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` oracle twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the payload of the latest right row with
    ``right_ts <= left_ts`` per equality key (NULLs when none precedes).

    Payload columns come back as ``<prefix><name>``; the right timestamp is
    always included as ``<prefix><right_ts>``.
    """
    payload = list(dict.fromkeys([right_ts, *right_payload]))
    left_cols = left.columns
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload).alias("__r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left_cols) + ">"
        ).alias("__l"),
    )
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__r"].dataType.simpleString()).alias("__r"),
        F.struct(*left_cols).alias("__l"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r2.unionByName(l2).withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__m.{p}").alias(f"{prefix}{p}") for p in payload],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_us: str,
    right_us: str,
    max_gap_us: int,
) -> DataFrame:
    """Pairs with ``0 <= right_us - left_us <= max_gap_us`` per equality key,
    via time-bucketed equi-join.

    A raw range join on (key, interval) degenerates to per-key quadratic
    work on hot keys. Bucketing by ``floor(ts / max_gap_us)`` and exploding
    the LEFT side into buckets [b, b+1] turns it into an equi-join on
    (key, bucket): each candidate pair is generated exactly once (the right
    row sits in a single bucket; the two exploded left buckets are
    distinct), then the exact range predicate filters. Shuffle width is
    2·|left| + |right| rows — linear, skew handled by AQE like any equi-join.
    """
    b_r = (F.col(right_us) / F.lit(max_gap_us)).cast("long")
    b_l = (F.col(left_us) / F.lit(max_gap_us)).cast("long")
    lx = left.withColumn("__b", F.explode(F.array(b_l, b_l + 1)))
    rx = right.withColumn("__b", b_r)
    pred = (F.col(f"r.{right_us}") >= F.col(f"l.{left_us}")) & (
        F.col(f"r.{right_us}") - F.col(f"l.{left_us}") <= max_gap_us
    )
    return (
        lx.alias("l")
        .join(rx.alias("r"), [*on, "__b"])
        .filter(pred)
        .drop("__b")
    )
