"""Structured Streaming surface: streaming seed ingestion + windowed
event-metric aggregation.

The crawl's main loop is deliberately batch micro-iterations (the north rule
specifies DataFrame micro-iterations; discrete rounds are also what makes
bit-identical resume possible — SURVEY.md §1.2). Streaming covers the two
places the reference is genuinely event-driven:

- **seed ingestion** ≙ webhook trigger (HTTP POST → trigger message,
  /root/reference/cmd/webhook-trigger/main.go:32-70): a file-source stream
  watches a drop directory of seed files and appends canonicalized,
  deduplicated seed batches to a target location between rounds
  (``foreachBatch`` — the sink adapter pattern; ≙ the reference's
  side-effecting slack-worker sink, cmd/slack-worker/main.go:31-84).
- **event-time metrics** ≙ the per-round fetch metrics, as a continuous
  windowed aggregation with watermarked late-data handling (the reference
  has no watermarks — SURVEY.md §2.10; NATS just drops after 1 h retention,
  nats.go:149-158).

Both pipelines support ``availableNow`` triggers so tests drain them
deterministically and compare against the equivalent batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from spider_go_spark.functions.urls import canonicalize_udf
from spider_go_spark.schemas import SEEDS


def read_seed_stream(spark: SparkSession, drop_dir: str, schema: StructType = SEEDS) -> DataFrame:
    """File-source stream over a seed drop directory (one parquet file per
    externally submitted seed batch; ≙ one webhook POST)."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(drop_dir)


def seed_ingestion_query(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Canonicalize + in-batch-dedup incoming seeds and stage them under
    ``out_dir`` (a parquet staging area the crawl driver drains into the
    frontier at the next round boundary — exactly the reference's
    trigger-message hand-off, workflow.go:83-127, minus the lost-on-crash
    in-memory stream).

    Delivery guarantee — stated precisely: foreachBatch is AT-LEAST-once
    (a batch retried after a failure re-runs), so each batch writes to its
    own deterministic ``batch_id=N`` directory with overwrite — the retry
    is idempotent, never a duplicate append. ``CrawlEngine.ingest_staged``
    deletes drained batch directories after its round commits; a crash
    between commit and delete re-ingests those batches once more, which the
    seen-set dedup absorbs (the enqueue is idempotent by url_norm). The
    batch body is the same vectorized kernel the round loop uses (no
    separate streaming code path to drift out of sync).
    """
    import os

    def ingest(batch: DataFrame, batch_id: int) -> None:
        out = (
            batch.withColumn("url_norm", canonicalize_udf(F.col("url")))
            .filter(F.col("url_norm").isNotNull())
            .groupBy("url_norm")
            .agg(F.max("priority").alias("priority"))
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    writer = (
        read_seed_stream(spark, drop_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_metrics(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream
    (works on both batch and streaming DataFrames — single definition, no
    drift between the streaming pipeline and its batch oracle)."""
    ts = F.col("ts").cast("timestamp")
    df = events.withColumn("ts", ts)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy(F.window(F.col("ts"), window).alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(F.col("w.start").alias("bucket_start"), "n", "sum_value")


def click_error_interval_join(
    clicks: DataFrame,
    errors: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: (click, error) pairs of the same user
    with the error inside ``max_gap`` after the click — the streaming twin
    of queries/temporal.range_click_error_pairs (same semantics, two
    independent plans: time-bucketed equi-join in batch, watermarked
    symmetric hash join here).

    Works on batch and streaming frames alike. On streams, both sides are
    watermarked and the join condition bounds event time in BOTH
    directions, so Spark can evict join state: a click older than
    (watermark - max_gap) can never match a future error and is dropped
    from the state store — without the bound, state grows forever."""
    c = clicks.select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    e = errors.select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("error_user_id"),
        F.col("ts").cast("timestamp").alias("error_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if e.isStreaming:
        e = e.withWatermark("error_ts", watermark)
    cond = (
        (c["user_id"] == e["error_user_id"])
        & (e["error_ts"] >= c["click_ts"])
        & (e["error_ts"] <= c["click_ts"] + F.expr(f"interval {max_gap}"))
    )
    return c.join(e, cond).select(
        "click_event_id",
        "error_event_id",
        "user_id",
        (F.unix_micros(F.col("error_ts")) - F.unix_micros(F.col("click_ts"))).alias(
            "gap_us"
        ),
    )


def click_error_join_query(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_table: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming click⋈error interval join from a file-source event stream
    to an in-memory sink (append mode — inner-join pairs emit as soon as
    both sides arrive; watermark only bounds state, not latency)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    joined = click_error_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "error"),
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def event_metrics_query(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_table: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming twin of relational.tumbling_window_counts: file-source
    events → watermarked windowed agg → in-memory sink named ``out_table``
    (complete mode: windows re-emit as late data arrives)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_metrics(stream)
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_event_metrics(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation per user (dynamic-gap windows: a session
    extends while events arrive within ``gap`` of the last one — the
    streaming twin of relational2.session_counts' gaps-and-islands form).
    Single definition for batch and streaming: the same call is the
    pipeline and its own batch oracle, so semantics cannot drift."""
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_metrics_query(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_table: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source events → watermarked per-user session windows →
    in-memory sink (complete mode: sessions re-emit as they merge/extend
    with late-but-in-watermark data)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = session_event_metrics(stream)
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
