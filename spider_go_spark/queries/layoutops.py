r"""Storage-layout operators: Z-order (Morton) clustering keys and a
min/max file-skipping audit — the data-layout planning surface of a
100-TB lakehouse.

The reference engine (a crawl/workflow system over MongoDB,
storage_workflow_mongodb.go) delegates physical layout to its database's
B-tree indexes. A Parquet/object-store engine has no secondary indexes;
its equivalent lever is *file layout*: rows clustered so that per-file
column min/max statistics (Parquet footers, Delta/Iceberg manifests) let
the scanner skip whole files for a selective predicate. Interleaved-bit
(Z-order / Morton) sort keys are the standard multi-dimensional
clustering recipe (used by Delta OPTIMIZE ZORDER and Iceberg sort
orders): sorting by the bit-interleave of two key columns keeps rows
close in BOTH dimensions, so min/max ranges per file stay tight for
either predicate column.

Two operators:

- ``zorder_key_sample`` — the Morton key itself: interleave the low 16
  bits of ``o_custkey`` and of the order date's day number, and show the
  head of the curve. Pure projection + top-k; the production twin is
  ``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")``
  before the write (a distributed range sort — sampled bounds, no
  single-task sort) — this query is its planning/debug surface.

- ``minmax_pruning_audit`` — the measurable payoff: simulate per-file
  min/max statistics under two layouts (natural insert order vs Z-order
  cells) and report, for one predicate per dimension, how many files a
  stats-aware scanner reads vs skips. Natural order clusters only the
  insert key, so a custkey or date predicate overlaps nearly every
  file; Z-order cells keep both dimensions tight. ``skip_pm`` is the
  per-mille of files skipped — the number a table-maintenance job would
  monitor to decide when to re-cluster.

Scale shape (10^10 rows): both layouts here are pure projections
(``file_id`` is a key-range / z-range cell id, no global row numbering),
so the audit is two hash aggregations on bounded keys (≤ #files rows
out) plus scalar counts — map-side partials do the work, nothing
collects, nothing sorts globally. Exactly the shape of a real stats
collector, which reads footers instead of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.queries import T

# ---------------------------------------------------------------------------
# Morton (Z-order) interleave of two 16-bit dimensions.
# x occupies even bit positions, y odd: zkey = Σ_i x_i·4^i·1 + y_i·4^i·2.
# Both engines fold the same 16-term bit expression, so keys are
# bit-identical.
# ---------------------------------------------------------------------------

ZBITS = 16
EPOCH_DAY0 = "1995-01-01"  # testdata orders start here; day fits 12 bits
FILE_SPAN = 512            # natural layout: one "file" per 512-orderkey span
ZCELL_SHIFT = 17           # z-order layout: one "file" per 2^17 z-range cell
                           # (30 cells at sf0.01 — same file count as natural)
# one selective predicate per clustered dimension
CUST_LO, CUST_HI = 400, 499
DAY_LO, DAY_HI = 1200, 1299


def _zkey_spark(x: str, y: str):
    """Interleave low ZBITS bits of bigint columns ``x`` (even positions)
    and ``y`` (odd positions) into one bigint Morton key."""
    return F.expr(
        f"aggregate(sequence(0, {ZBITS - 1}), 0L, (acc, i) -> "
        f"acc | shiftleft(shiftright({x}, i) & 1, 2*i)"
        f"    | shiftleft(shiftright({y}, i) & 1, 2*i + 1))"
    )


def _zkey_sql(x: str, y: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, {ZBITS}), "
        f"i -> ((({x} >> i) & 1) << (2*i)) | ((({y} >> i) & 1) << (2*i + 1)))), "
        "(a, b) -> a | b)"
    )


def _dims(spark: SparkSession, sf: str) -> DataFrame:
    """orders → (o_orderkey, cust, day, zkey): the two clustering
    dimensions as bounded non-negative ints plus their Morton key."""
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("cust"),
        F.datediff(F.col("o_orderdate"), F.lit(EPOCH_DAY0)).cast("long").alias("day"),
    ).withColumn("zkey", _zkey_spark("cust", "day"))


_DIMS_SQL = f"""
  SELECT o_orderkey, o_custkey::BIGINT AS cust,
         (o_orderdate::DATE - DATE '{EPOCH_DAY0}')::BIGINT AS day,
         {_zkey_sql("(o_custkey::BIGINT)", "((o_orderdate::DATE - DATE '" + EPOCH_DAY0 + "')::BIGINT)")} AS zkey
  FROM orders
"""


def zorder_key_sample(spark: SparkSession, sf: str) -> DataFrame:
    """(o_orderkey, cust, day, zkey) — the head of the Z-order curve:
    the 64 smallest Morton keys. Neighbors on the curve are close in
    BOTH cust and day, which is the whole point of the layout. Plan:
    projection + TakeOrderedAndProject (per-partition top-k, merge on
    the driver) — no global sort."""
    d = _dims(spark, sf)
    return d.orderBy("zkey", "o_orderkey").limit(64)


ZORDER_KEY_SAMPLE_SQL = f"""
WITH d AS ({_DIMS_SQL})
SELECT o_orderkey, cust, day, zkey FROM d ORDER BY zkey, o_orderkey LIMIT 64
"""


def minmax_pruning_audit(spark: SparkSession, sf: str) -> DataFrame:
    """(layout, predicate, n_files, files_scanned, rows_scanned,
    rows_matched, skip_pm) — per-file min/max skipping effectiveness
    under 'natural' (orderkey-span files ≙ insert order) vs 'zorder'
    (z-range cell files) layouts, for one range predicate per clustered
    dimension. A file is scanned when its [min, max] of the predicate
    column overlaps the predicate range — exactly the Parquet
    footer / manifest pruning rule. ``skip_pm`` = 1000 · skipped/files.

    Both file ids are pure projections (key-range cells), so the audit
    is one groupBy per layout bounded by the file count — the same
    O(#files) shape as reading footers at 100 TB."""
    d = _dims(spark, sf).localCheckpoint(eager=True)
    files = (
        d.select(
            F.lit("natural").alias("layout"),
            # integer `div` (≡ DuckDB `//`): parity contract stays integral
            F.expr(f"o_orderkey div {FILE_SPAN}").cast("long").alias("file_id"),
            "cust",
            "day",
        )
        .unionByName(
            d.select(
                F.lit("zorder").alias("layout"),
                F.shiftright(F.col("zkey"), ZCELL_SHIFT).cast("long").alias("file_id"),
                "cust",
                "day",
            )
        )
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cust").alias("cust_min"),
            F.max("cust").alias("cust_max"),
            F.min("day").alias("day_min"),
            F.max("day").alias("day_max"),
        )
    )
    preds = [
        ("cust_range", "cust_min", "cust_max", CUST_LO, CUST_HI, "cust"),
        ("day_range", "day_min", "day_max", DAY_LO, DAY_HI, "day"),
    ]
    parts = []
    for name, mn, mx, lo, hi, col in preds:
        overlap = (F.col(mn) <= hi) & (F.col(mx) >= lo)
        stats = files.groupBy("layout").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(overlap.cast("long")).alias("files_scanned"),
            F.sum(F.when(overlap, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
        )
        matched = d.filter(F.col(col).between(lo, hi)).count()
        parts.append(
            stats.select(
                "layout",
                F.lit(name).alias("predicate"),
                "n_files",
                "files_scanned",
                "rows_scanned",
                F.lit(matched).cast("bigint").alias("rows_matched"),
                (F.lit(1000) * (F.col("n_files") - F.col("files_scanned"))
                 / F.col("n_files")).cast("bigint").alias("skip_pm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


MINMAX_PRUNING_AUDIT_SQL = f"""
WITH d AS ({_DIMS_SQL}),
files AS (
  SELECT layout, file_id, count(*) AS n_rows,
         min(cust) AS cust_min, max(cust) AS cust_max,
         min(day) AS day_min, max(day) AS day_max
  FROM (
    SELECT 'natural' AS layout, o_orderkey // {FILE_SPAN} AS file_id, cust, day FROM d
    UNION ALL
    SELECT 'zorder' AS layout, zkey >> {ZCELL_SHIFT} AS file_id, cust, day FROM d
  ) GROUP BY layout, file_id
),
matched AS (
  SELECT 'cust_range' AS predicate,
         count(*) FILTER (WHERE cust BETWEEN {CUST_LO} AND {CUST_HI})::BIGINT AS rows_matched_c,
         count(*) FILTER (WHERE day BETWEEN {DAY_LO} AND {DAY_HI})::BIGINT AS rows_matched_d
  FROM d
),
audit AS (
  SELECT layout, 'cust_range' AS predicate,
         count(*)::BIGINT AS n_files,
         sum((cust_min <= {CUST_HI} AND cust_max >= {CUST_LO})::INT)::BIGINT AS files_scanned,
         sum(CASE WHEN cust_min <= {CUST_HI} AND cust_max >= {CUST_LO} THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned
  FROM files GROUP BY layout
  UNION ALL
  SELECT layout, 'day_range' AS predicate,
         count(*)::BIGINT AS n_files,
         sum((day_min <= {DAY_HI} AND day_max >= {DAY_LO})::INT)::BIGINT AS files_scanned,
         sum(CASE WHEN day_min <= {DAY_HI} AND day_max >= {DAY_LO} THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned
  FROM files GROUP BY layout
)
SELECT a.layout, a.predicate, a.n_files, a.files_scanned, a.rows_scanned,
       (CASE WHEN a.predicate = 'cust_range' THEN m.rows_matched_c ELSE m.rows_matched_d END) AS rows_matched,
       (1000 * (a.n_files - a.files_scanned) // a.n_files)::BIGINT AS skip_pm
FROM audit a CROSS JOIN matched m
"""


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int | None = None
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of integer
    columns ``x``/``y`` — the production twin of ``minmax_pruning_audit``'s
    simulated z-layout (what Delta ``OPTIMIZE ZORDER BY`` does):
    ``repartitionByRange`` over the z-key (a distributed total order —
    sampled bounds, every partition sorts locally, no single-task sort)
    then ``sortWithinPartitions``, one output file per range partition, so
    each file's min/max of BOTH dimensions stays tight and a stats-aware
    scan skips non-overlapping files. ``n_files`` defaults to the session
    parallelism; at 100 TB pick corpus_bytes / target_file_bytes."""
    spark = df.sparkSession
    n = n_files or spark.sparkContext.defaultParallelism
    (
        df.withColumn("_zkey", _zkey_spark(x, y))
        .repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(df_with_file: DataFrame, cols: list[str]) -> DataFrame:
    """Per-input-file min/max stats for ``cols`` — the footer-reader twin
    used to audit a written layout: group the scan by
    ``input_file_name()`` and aggregate. O(#files) output."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df_with_file.groupBy(
        F.input_file_name().alias("file")
    ).agg(*aggs)


QUERIES = {
    "zorder_key_sample": zorder_key_sample,
    "minmax_pruning_audit": minmax_pruning_audit,
}
ORACLES = {
    "zorder_key_sample": ZORDER_KEY_SAMPLE_SQL,
    "minmax_pruning_audit": MINMAX_PRUNING_AUDIT_SQL,
}
