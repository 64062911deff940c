"""CDX-over-WARC index: distributed build, byte-range point reads, SURT
prefix range lookups — over both plain and per-record-gzipped archives."""

import os

import pytest

from spider_go_spark.functions.urls import surt_key_one
from spider_go_spark.sources.warc import WARC_SCHEMA, WarcDataSource
from spider_go_spark.sources.warcindex import (
    build_cdx,
    cdx_prefix,
    fetch_captures,
    read_record,
)


@pytest.fixture(scope="module")
def warc_registered(spark):
    spark.dataSource.register(WarcDataSource)
    return spark


def _rows(n):
    return [
        (
            f"<urn:doc:{i:04d}>",
            "response",
            f"http://h{i % 3}.example.test/p/{i}",
            "application/octet-stream",
            (f"payload {i}\r\n\r\nWARC/1.0\r\n".encode() + bytes([0, 13, 10, i % 256])),
        )
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def archive(warc_registered, tmp_path_factory):
    """A mixed archive: 17 records plain + 14 records gzipped."""
    root = str(tmp_path_factory.mktemp("cdx-archive"))
    warc_registered.createDataFrame(_rows(17), WARC_SCHEMA).repartition(
        3
    ).write.format("warc").option("path", root).mode("append").save()
    gz_rows = [
        (f"<urn:gz:{i:04d}>", "response", f"http://gz{i % 2}.example.test/q/{i}",
         "text/plain", f"gz body {i}".encode())
        for i in range(14)
    ]
    warc_registered.createDataFrame(gz_rows, WARC_SCHEMA).repartition(
        2
    ).write.format("warc").option("path", root).option(
        "compression", "gzip"
    ).mode("append").save()
    return root, set(_rows(17)) | set(gz_rows)


def test_index_covers_every_record_with_correct_ranges(warc_registered, archive):
    root, expect = archive
    idx = build_cdx(warc_registered, root).collect()
    assert len(idx) == len(expect)
    assert {r["record_id"] for r in idx} == {e[0] for e in expect}
    # surt keys match the pure-python kernel
    for r in idx:
        assert r["surt_key"] == surt_key_one(r["target_uri"])
    # every (offset, length) slice decodes to exactly its record
    by_id = {e[0]: e for e in expect}
    for r in idx:
        rid, wtype, uri, ctype, payload = read_record(
            r["file"], r["offset"], r["length"], r["compressed"]
        )
        assert (rid, wtype, uri, ctype, bytes(payload)) == by_id[r["record_id"]]
    # compressed flag tracks the file extension
    for r in idx:
        assert r["compressed"] == r["file"].endswith(".gz")


def test_ranges_tile_each_file_exactly(warc_registered, archive):
    """Offsets/lengths partition each archive file with no gaps or overlap
    — the property that makes ranged GETs safe."""
    root, _ = archive
    idx = build_cdx(warc_registered, root).collect()
    by_file = {}
    for r in idx:
        by_file.setdefault(r["file"], []).append((r["offset"], r["length"]))
    for path, ranges in by_file.items():
        ranges.sort()
        pos = 0
        for off, ln in ranges:
            assert off == pos, f"{path}: gap/overlap at {pos}"
            pos = off + ln
        assert pos == os.path.getsize(path)


def test_prefix_lookup_is_a_range_and_matches_startswith(warc_registered, archive):
    root, expect = archive
    idx = build_cdx(warc_registered, root)
    prefix = "test,example,h1)"
    hits = cdx_prefix(idx, prefix).collect()
    want = {
        e[0] for e in expect if surt_key_one(e[2]).startswith(prefix)
    }
    assert want and {r["record_id"] for r in hits} == want
    # and the range filter is what the plan runs (no UDF, no startswith)
    plan = cdx_prefix(idx, prefix)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_fetch_captures_distributed_point_reads(warc_registered, archive):
    root, expect = archive
    idx = build_cdx(warc_registered, root)
    got = fetch_captures(cdx_prefix(idx, "test,example,gz0)")).collect()
    want = {
        (e[0], e[1], e[2], e[3], e[4])
        for e in expect
        if surt_key_one(e[2]).startswith("test,example,gz0)")
    }
    assert want
    assert {
        (r["record_id"], r["warc_type"], r["target_uri"], r["content_type"],
         bytes(r["payload"]))
        for r in got
    } == want
    for r in got:
        assert r["surt_key"] == surt_key_one(r["target_uri"])


def test_empty_dir_and_point_read_errors(warc_registered, tmp_path):
    assert build_cdx(warc_registered, str(tmp_path)).count() == 0
    # a short byte range fails loudly, never returns a partial record
    root = str(tmp_path / "a")
    warc_registered.createDataFrame(_rows(1), WARC_SCHEMA).repartition(
        1
    ).write.format("warc").option("path", root).mode("append").save()
    f = os.path.join(root, [p for p in os.listdir(root)][0])
    size = os.path.getsize(f)
    with pytest.raises(ValueError, match="short read"):
        read_record(f, 0, size + 10, False)
    with pytest.raises(ValueError):
        read_record(f, 0, size - 2, False)
