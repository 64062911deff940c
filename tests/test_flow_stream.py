"""Streaming flow interpretation: continuous trigger consumption through
the generic DAG must equal one batch interpretation of the same triggers —
including across a stop/restart on the same checkpoint (no reprocessing,
no loss), and with multi-emit fan-out in the DAG."""

import time

import pytest

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.plans.flow import FlowCatalog, FlowRuntime, row_worker
from spider_go_spark.streaming.flowstream import flow_stream_query, read_flow_sink


def echo_b(values, config):
    return [("success", {"value": values["value"]})]


def fan3(values, config):
    return [("success", {"item": f"{values['value']}@{i}"}) for i in range(3)]


def _chain_catalog():
    return (
        FlowCatalog("stream-chain")
        .add_action("a1", "trigger-action")
        .add_action(
            "a2", "echo-action",
            mapper={"value": Mapper("expression", "a1.output.value + '_x1'")},
        )
        .add_action(
            "fan", "fan-action",
            mapper={"value": Mapper("key", "a2.output.value")},
        )
        .add_action("sink", "sink-action", mapper={"item": Mapper("key", "fan.output.item")})
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "fan")
        .add_dep("fan", "success", "sink")
    )


def _workers():
    return {
        "echo-action": row_worker(echo_b, "value string"),
        "fan-action": row_worker(fan3, "item string"),
    }


def _await_sink_rows(spark, out_dir, key, want, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if read_flow_sink(spark, out_dir, key).count() >= want:
                return
        except Exception:
            pass  # sink dir not created yet
        time.sleep(1)
    raise AssertionError(f"sink {key} never reached {want} rows")


def test_stream_equals_batch_across_restart(spark, tmp_path):
    trig_dir = str(tmp_path / "triggers")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "triggers").mkdir()

    chunk1 = spark.createDataFrame(
        [("t1", "hello"), ("t2", "world")], "task_id string, value string"
    )
    chunk2 = spark.createDataFrame(
        [("t3", "again"), ("t4", "more")], "task_id string, value string"
    )
    chunk1.coalesce(1).write.mode("append").parquet(trig_dir)

    q = flow_stream_query(
        spark, _chain_catalog(), _workers(), "a1", "triggered",
        trig_dir, "task_id string, value string", out_dir, ckpt,
        sink_keys=["sink"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _await_sink_rows(spark, out_dir, "sink", 6)
    first = {
        (r["task_id"], r["item"])
        for r in read_flow_sink(spark, out_dir, "sink").collect()
    }
    assert len(first) == 6  # 2 triggers × 3-way fan-out

    # drop more triggers while the stream is DOWN; restart on the same
    # checkpoint — it must pick up only the new files
    chunk2.coalesce(1).write.mode("append").parquet(trig_dir)
    q = flow_stream_query(
        spark, _chain_catalog(), _workers(), "a1", "triggered",
        trig_dir, "task_id string, value string", out_dir, ckpt,
        sink_keys=["sink"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _await_sink_rows(spark, out_dir, "sink", 12)
    got = {
        (r["task_id"], r["item"])
        for r in read_flow_sink(spark, out_dir, "sink").collect()
    }
    assert first <= got and len(got) == 12  # batch-1 outputs untouched

    # streaming ≡ batch: one FlowRuntime pass over all four triggers
    rt = FlowRuntime(spark, _chain_catalog(), _workers())
    res = rt.trigger("a1", "triggered", chunk1.unionByName(chunk2))
    expect = set()
    for df in res.delivered["sink"]:
        for r in df.select("task_id", "val.item").collect():
            expect.add((r["task_id"], r["item"]))
    # deterministic task paths make streaming and batch results
    # tuple-identical, not merely value-equal
    assert got == expect


def test_generated_task_ids_unique_across_batches(spark, tmp_path):
    """Trigger files WITHOUT a task_id column: generated ids must not
    collide between micro-batches (the batch interpreter's ordinal
    fallback restarts per batch; the stream scopes it by batch id)."""
    trig_dir = str(tmp_path / "t2")
    out_dir = str(tmp_path / "o2")
    ckpt = str(tmp_path / "c2")
    (tmp_path / "t2").mkdir()

    for chunk in (["hello", "world"], ["again", "more"]):
        spark.createDataFrame([(v,) for v in chunk], "value string") \
            .coalesce(1).write.mode("append").parquet(trig_dir)
        q = flow_stream_query(
            spark, _chain_catalog(), _workers(), "a1", "triggered",
            trig_dir, "value string", out_dir, ckpt, sink_keys=["sink"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    rows = read_flow_sink(spark, out_dir, "sink").collect()
    task_ids = [r["task_id"] for r in rows]
    assert len(rows) == 12  # 4 triggers × 3-way fan-out, none lost
    assert len(set(task_ids)) == 12  # no cross-batch collisions
