"""Continuous flow interpretation — the reference's actual runtime shape.

spider-go is a streaming system: trigger messages arrive on a NATS subject
and each one is interpreted through the user's workflow DAG as it lands
(pkg/spider/workflow.go:83-127 consumes the trigger stream; worker
listeners consume action inputs continuously, worker.go:45-53). The batch
``FlowRuntime`` (plans/flow.py) interprets one trigger batch; this module
wraps it in Structured Streaming so trigger messages are consumed
CONTINUOUSLY with checkpointed progress and restart/resume — the missing
half of the reference's delivery model.

Spark-first shape: ``readStream`` over a trigger drop directory (≙ the
NATS trigger subject; files land, the stream picks them up) →
``foreachBatch`` runs the full DAG interpretation per micro-batch → each
sink action's deliveries append as parquet under
``out_dir/<key>/batch=<id>``. Idempotence: foreachBatch is at-least-once,
so a replayed batch id OVERWRITES its own ``batch=<id>`` directory — the
observable output is exactly-once per batch id (same protocol as the
engine's docs sink, plans/round_loop.py).

Scale: the per-micro-batch work is the batch interpreter's — Arrow map
stages and codegen projections, no shuffle per hop; the stream adds only
file-listing + checkpoint I/O. At 10^7 triggers/hour this is a handful of
micro-batches, each a distributed map over the batch, not an actor storm.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_go_spark.plans.flow import FlowCatalog, FlowRuntime, Worker


def _flatten_delivery(df: DataFrame) -> DataFrame:
    """Project a delivered input batch to its oracle-comparable shape:
    task_id + the mapped value fields (empty-mapper children deliver only
    the task identity, matching ex(env, nil) = {})."""
    if "val" in df.columns:
        return df.select("task_id", "val.*")
    return df.select("task_id")


def flow_stream_query(
    spark: SparkSession,
    catalog: FlowCatalog,
    workers: dict[str, Worker],
    trigger_key: str,
    meta_output: str,
    trigger_dir: str,
    trigger_schema: T.StructType | str,
    out_dir: str,
    checkpoint_dir: str,
    sink_keys: Iterable[str],
    max_files_per_trigger: int = 8,
):
    """Start the continuous interpreter: trigger parquet files landing in
    ``trigger_dir`` are consumed in micro-batches; each batch runs the DAG
    via ``FlowRuntime.trigger`` and the deliveries to every action in
    ``sink_keys`` are written under ``out_dir/<key>/batch=<id>``.

    Returns the StreamingQuery. Restart with the same ``checkpoint_dir``
    resumes from the last committed batch; a replayed batch overwrites its
    own output directory (exactly-once observable effect)."""
    if isinstance(trigger_schema, str):
        trigger_schema = T._parse_datatype_string(trigger_schema)
    sink_keys = list(sink_keys)
    for k in sink_keys:
        catalog.action(k)  # fail fast on unknown sink keys
    runtime = FlowRuntime(spark, catalog, workers)

    def interpret(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if "task_id" not in batch.columns:
            # the batch interpreter's ordinal fallback restarts every
            # micro-batch; scope generated ids by batch so session/task
            # identities stay unique across the stream's lifetime
            batch = batch.withColumn(
                "task_id",
                F.concat(
                    F.lit(f"b{batch_id}-"),
                    F.monotonically_increasing_id().cast("string"),
                ),
            )
        res = runtime.trigger(trigger_key, meta_output, batch)
        for key in sink_keys:
            batches = [_flatten_delivery(b) for b in res.delivered.get(key, [])]
            if not batches:
                continue
            out = batches[0]
            for b in batches[1:]:
                out = out.unionByName(b)
            target = f"{out_dir}/{key}/batch={batch_id}"
            # mode=overwrite on the batch-scoped dir = replay idempotence
            out.write.mode("overwrite").parquet(target)

    stream = (
        spark.readStream.schema(trigger_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(trigger_dir)
    )
    return (
        stream.writeStream.foreachBatch(interpret)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_flow_sink(spark: SparkSession, out_dir: str, key: str) -> DataFrame:
    """Read every batch's deliveries for one sink action (the ``batch=<id>``
    partitioning is an idempotence detail, not part of the value)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{out_dir}/{key}")
    )
