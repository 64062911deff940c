"""Structured Streaming tests: seed ingestion (foreachBatch sink) and
watermarked windowed metrics, each drained with availableNow and compared
against its batch twin."""

import os

import pytest
from pyspark.sql import functions as F

from spider_go_spark.schemas import SEEDS
from spider_go_spark.streaming.pipeline import (
    click_error_interval_join,
    click_error_join_query,
    event_metrics_query,
    seed_ingestion_query,
    windowed_event_metrics,
)


def test_seed_ingestion_stream(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop)
    # two webhook batches, with messy dupes that canonicalize together
    b1 = spark.createDataFrame(
        [("HTTP://Host.Example.test:80/p/1#frag", 1.0), ("http://host.example.test/p/1", 2.0)],
        SEEDS,
    )
    b2 = spark.createDataFrame([("http://host.example.test/p/2", 0.5)], SEEDS)
    b1.coalesce(1).write.mode("append").parquet(drop)
    q = seed_ingestion_query(spark, drop, out, ckpt)
    q.awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(drop)
    q2 = seed_ingestion_query(spark, drop, out, ckpt)
    q2.awaitTermination(120)

    staged = spark.read.parquet(out)
    rows = {r["url_norm"]: r for r in staged.collect()}
    # dupes collapsed to one canonical row with max priority
    assert set(rows) == {"http://host.example.test/p/1", "http://host.example.test/p/2"}
    assert rows["http://host.example.test/p/1"]["priority"] == 2.0
    # second batch processed exactly once (checkpointed offsets)
    assert staged.count() == 2


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt2")
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1.0),
            (2, "2024-01-01 00:50:00", 2.0),
            (3, "2024-01-01 01:05:00", 4.0),
            (4, "2024-01-01 00:20:00", 8.0),  # late within watermark
            (5, "2024-01-01 02:59:00", 16.0),
        ],
        ["event_id", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(events_dir)

    q = event_metrics_query(
        spark, events_dir, events.schema, "stream_metrics", ckpt
    )
    q.awaitTermination(120)
    got = {
        str(r["bucket_start"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM stream_metrics").collect()
    }
    expect = {
        str(r["bucket_start"]): (r["n"], r["sum_value"])
        for r in windowed_event_metrics(events).collect()
    }
    assert got == expect
    assert got[str("2024-01-01 00:00:00")] == (3, 11.0)


def test_streaming_url_dedup(spark, tmp_path):
    """Streaming exact dedup of a URL stream (dropDuplicates keyed on the
    canonical URL, state persisted in the checkpoint across restarts) —
    the streaming face of the crawl's seen-set semantics."""
    src = str(tmp_path / "urls")
    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(src)
    cols = ["url_norm", "priority"]
    spark.createDataFrame(
        [("http://h/p/1", 1.0), ("http://h/p/2", 1.0), ("http://h/p/1", 2.0)], cols
    ).coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .dropDuplicates(["url_norm"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # second batch repeats an old URL and adds a new one; dedup state spans
    # the restart via the checkpoint
    spark.createDataFrame(
        [("http://h/p/2", 9.0), ("http://h/p/3", 1.0)], cols
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    urls = sorted(r["url_norm"] for r in spark.read.parquet(out).collect())
    assert urls == ["http://h/p/1", "http://h/p/2", "http://h/p/3"]


def test_stateful_budget_limiter(spark, tmp_path):
    """applyInPandasWithState per-host admission budget: state persists
    across micro-batches (and across query restarts via the checkpoint)."""
    from spider_go_spark.streaming.stateful import CANDIDATE_SCHEMA, admit_stream

    src = str(tmp_path / "cands")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt-state")
    os.makedirs(src)

    def run():
        q = (
            admit_stream(
                spark.readStream.schema(CANDIDATE_SCHEMA).parquet(src), host_budget=3
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: host A gets 2 of budget 3; host B gets 1
    spark.createDataFrame(
        [("a", "http://a/1", 2.0), ("a", "http://a/2", 1.0), ("b", "http://b/1", 5.0)],
        CANDIDATE_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    # batch 2 (fresh query, state restored from checkpoint): host A has only
    # 1 budget unit left -> highest-priority of the two is admitted
    spark.createDataFrame(
        [("a", "http://a/3", 0.5), ("a", "http://a/4", 9.0)], CANDIDATE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    rows = {r["url_norm"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"http://a/1", "http://a/2", "http://b/1", "http://a/4"}
    assert rows["http://a/1"]["admitted_rank"] == 1  # higher priority first
    assert rows["http://a/2"]["admitted_rank"] == 2
    assert rows["http://a/4"]["admitted_rank"] == 3  # budget exhausted after this
    assert rows["http://b/1"]["admitted_rank"] == 1


def test_stream_stream_interval_join_equals_batch_range_join(spark, tmp_path):
    """The streaming interval join, drained with availableNow, must produce
    exactly the pair set of (a) its own batch execution and (b) the
    independently-planned time-bucketed batch range join the gate checks —
    three plans, one semantics."""
    sf = "/root/testdata/sf0.001"
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_join")
    events = spark.read.parquet(f"{sf}/events.parquet")
    # re-write so the stream source sees a directory it can list cleanly
    events.write.mode("overwrite").parquet(events_dir)

    q = click_error_join_query(spark, events_dir, events.schema, "stream_pairs", ckpt)
    q.awaitTermination(180)
    got = sorted(
        (r["click_event_id"], r["error_event_id"], r["user_id"], r["gap_us"])
        for r in spark.sql("SELECT * FROM stream_pairs").collect()
    )

    batch_same_fn = sorted(
        (r["click_event_id"], r["error_event_id"], r["user_id"], r["gap_us"])
        for r in click_error_interval_join(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "error"),
        ).collect()
    )
    from spider_go_spark.queries.temporal import range_click_error_pairs

    batch_bucketed = sorted(
        (r["click_event_id"], r["error_event_id"], r["user_id"], r["gap_us"])
        for r in range_click_error_pairs(spark, sf).collect()
    )
    assert got == batch_same_fn
    assert got == batch_bucketed
    assert len(got) > 0


def test_streaming_session_windows_equal_batch(spark, tmp_path):
    """Streaming session windows (dynamic gap, watermarked) equal the same
    definition run in batch — including a session merged by a late event
    that bridges two otherwise-separate sessions."""
    from spider_go_spark.streaming.pipeline import (
        session_event_metrics,
        session_metrics_query,
    )

    events_dir = str(tmp_path / "sess_events")
    ckpt = str(tmp_path / "sess_ckpt")
    events = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 00:00:00", 1.0),
            (2, "u1", "2024-01-01 00:20:00", 2.0),   # same session (gap 20m)
            (3, "u1", "2024-01-01 01:30:00", 4.0),   # new session
            (4, "u1", "2024-01-01 00:45:00", 8.0),   # late: bridges 1+2 → 0:00-1:15? no: extends session to 1:15
            (5, "u2", "2024-01-01 00:05:00", 16.0),
        ],
        ["event_id", "user_id", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(events_dir)

    q = session_metrics_query(
        spark, events_dir, events.schema, "stream_sessions", ckpt
    )
    q.awaitTermination(120)
    key = lambda r: (r["user_id"], str(r["session_start"]))
    got = {
        key(r): (str(r["session_end"]), r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    expect = {
        key(r): (str(r["session_end"]), r["n_events"], r["sum_value"])
        for r in session_event_metrics(events).collect()
    }
    assert got == expect
    # u1's first session covers events 1,2,4 (the late event extended it)
    u1_first = got[("u1", "2024-01-01 00:00:00")]
    assert u1_first[1] == 3 and u1_first[2] == 11.0
    assert ("u2", "2024-01-01 00:05:00") in got


def _replay_throttle(rows, cap_u, decay_ppm):
    """Pure-Python fold of the decayed rate throttle, host by host."""
    from spider_go_spark.streaming.stateful import THROTTLE_SCALE

    state = {}
    admitted = []
    by_host = {}
    for h, u, rnd in rows:
        by_host.setdefault(h, []).append((rnd, u))
    for h, items in by_host.items():
        last_round, rate = -1, 0
        for rnd, u in sorted(items):
            if last_round >= 0 and rnd > last_round:
                for _ in range(rnd - last_round):
                    rate = rate * decay_ppm // THROTTLE_SCALE
            last_round = max(last_round, rnd)
            if rate < cap_u:
                rate += THROTTLE_SCALE
                admitted.append((h, u, rnd, rate))
    return sorted(admitted)


def test_stateful_rate_throttle_decay_and_restart(spark, tmp_path):
    """Decayed per-host rate limiter: bursts are cut, quiet rounds restore
    rate, and the decision sequence survives a query restart (checkpointed
    state) — equal to the pure-Python replay of the full input."""
    from spider_go_spark.streaming.stateful import (
        RATE_CANDIDATE_SCHEMA,
        THROTTLE_SCALE,
        throttle_stream,
    )

    cap_u = 2 * THROTTLE_SCALE  # sustained rate: ~2 admits per round
    decay_ppm = 500_000  # halve each round

    src = str(tmp_path / "rate-cands")
    out = str(tmp_path / "rate-admitted")
    ckpt = str(tmp_path / "ckpt-rate")
    os.makedirs(src)

    def run():
        q = (
            throttle_stream(
                spark.readStream.schema(RATE_CANDIDATE_SCHEMA).parquet(src),
                rate_cap_u=cap_u,
                decay_ppm=decay_ppm,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    batch1 = [("a", f"http://a/{i}", 0) for i in range(5)] + [
        ("b", "http://b/0", 0)
    ]
    batch2 = [("a", f"http://a/x{i}", 1) for i in range(3)] + [
        ("a", "http://a/late", 4),
        ("b", "http://b/1", 4),
    ]
    spark.createDataFrame(batch1, RATE_CANDIDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    spark.createDataFrame(batch2, RATE_CANDIDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()  # fresh query object; state restored from checkpoint

    got = sorted(
        (r["host"], r["url_norm"], r["round"], r["rate_u"])
        for r in spark.read.parquet(out).collect()
    )
    want = _replay_throttle(
        [(h, u, rnd) for h, u, rnd in batch1 + batch2], cap_u, decay_ppm
    )
    assert got == want
    # burst cut: round 0 admitted exactly cap/SCALE = 2 of host a's 5
    assert sum(1 for h, _, rnd, _ in got if h == "a" and rnd == 0) == 2
    # quiet gap restores rate: host a admits again by round 4
    assert any(h == "a" and rnd == 4 for h, _, rnd, _ in got)
