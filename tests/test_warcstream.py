"""Streaming WARC source (sources/warc.WarcStreamDataSource): archive
directories replay as a stream with exactly-once file delivery across
micro-batches AND across a query restart from checkpoint."""

import pytest

from spider_go_spark.sources.warc import (
    WARC_SCHEMA,
    WarcDataSource,
    WarcStreamDataSource,
)


def _rows(lo, hi):
    return [
        (f"<urn:rec:{i}>", "response", f"http://h.example.test/{i}",
         "text/plain", bytes([i % 251]) * (i % 7 + 1))
        for i in range(lo, hi)
    ]


@pytest.fixture(scope="module")
def both_registered(spark):
    spark.dataSource.register(WarcDataSource)
    spark.dataSource.register(WarcStreamDataSource)
    return spark


def _write_round(spark, root, rnd, lo, hi):
    spark.createDataFrame(_rows(lo, hi), WARC_SCHEMA).repartition(2).write.format(
        "warc"
    ).option("path", f"{root}/round={rnd}").mode("append").save()


def _ids(spark, out):
    return {
        r["record_id"] for r in spark.read.schema(WARC_SCHEMA).parquet(out).collect()
    }


def test_stream_delivers_rounds_exactly_once(both_registered, tmp_path):
    spark = both_registered
    root, out, ckpt = (str(tmp_path / d) for d in ("arch", "out", "ckpt"))
    _write_round(spark, root, 0, 0, 10)

    def run_query():
        return (
            spark.readStream.format("warcstream").option("path", root).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = run_query()
    q.processAllAvailable()
    assert _ids(spark, out) == {f"<urn:rec:{i}>" for i in range(10)}

    _write_round(spark, root, 1, 10, 25)
    q.processAllAvailable()
    q.stop()
    assert _ids(spark, out) == {f"<urn:rec:{i}>" for i in range(25)}

    # restart from the checkpoint: a round written while the query was down
    # arrives exactly once; nothing already delivered repeats
    _write_round(spark, root, 2, 25, 30)
    q = run_query()
    q.processAllAvailable()
    q.stop()
    rows = spark.read.schema(WARC_SCHEMA).parquet(out).collect()
    ids = [r["record_id"] for r in rows]
    assert sorted(ids) == sorted(set(ids))  # no duplicates, ever
    assert set(ids) == {f"<urn:rec:{i}>" for i in range(30)}
    # payloads survive the stream byte-exactly
    by_id = {r["record_id"]: bytes(r["payload"]) for r in rows}
    for rid, _, _, _, payload in _rows(0, 30):
        assert by_id[rid] == payload
