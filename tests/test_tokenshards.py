"""Binary token-shard source/sink (sources/tokenshards.py): bit-exact
roundtrip, header accounting, fixed-width/int32 validation, overwrite vs
append semantics, and the tokenize→chunk→pad projection against a
pure-Python replay (the cross-engine value gate is token_shard_samples)."""

import re
import struct

import pytest

from spider_go_spark.sources.tokenshards import (
    PAD_ID,
    SHARD_SCHEMA,
    VOCAB,
    TokenShardDataSource,
    _decode_shard,
    fixed_width_samples,
)

SF = "/root/testdata/sf0.001"
POLY_P = 1_000_000_007


@pytest.fixture(scope="module")
def ts_registered(spark):
    spark.dataSource.register(TokenShardDataSource)
    return spark


def _rows(n, seq_len):
    return [(i, [(i * 31 + j) % VOCAB for j in range(seq_len)]) for i in range(n)]


def test_roundtrip_bit_exact(ts_registered, tmp_path):
    spark = ts_registered
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(_rows(57, 16), SHARD_SCHEMA).repartition(4)
    df.write.format("tokenshards").option("path", out).option("seq_len", 16).mode("append").save()
    back = spark.read.format("tokenshards").option("path", out).load()
    got = {(r["sample_id"], tuple(r["tokens"])) for r in back.collect()}
    assert got == {(i, tuple(t)) for i, t in _rows(57, 16)}


def test_header_counts_and_format(ts_registered, tmp_path):
    spark = ts_registered
    out = str(tmp_path / "shards")
    spark.createDataFrame(_rows(10, 4), SHARD_SCHEMA).repartition(2).write.format(
        "tokenshards"
    ).option("path", out).option("seq_len", 4).mode("append").save()
    total = 0
    for p in sorted((tmp_path / "shards").glob("*.bin")):
        blob = p.read_bytes()
        magic, seq_len, n = struct.unpack_from("<8sIQ", blob, 0)
        assert magic == b"SGSHARD1" and seq_len == 4
        assert len(blob) == 20 + n * (8 + 4 * 4)
        total += n
        assert len(list(_decode_shard(blob, str(p)))) == n
    assert total == 10


def test_validation_errors(ts_registered, tmp_path):
    spark = ts_registered
    bad_width = spark.createDataFrame([(1, [1, 2, 3])], SHARD_SCHEMA)
    with pytest.raises(Exception, match="fixed-width"):
        bad_width.write.format("tokenshards").option(
            "path", str(tmp_path / "w")
        ).option("seq_len", 8).mode("append").save()
    bad_range = spark.createDataFrame([(1, [1, 2])], SHARD_SCHEMA).selectExpr(
        "sample_id", "transform(tokens, t -> t * 2000000000L) as tokens"
    )
    with pytest.raises(Exception, match="int32|LongType|BIGINT"):
        bad_range.write.format("tokenshards").option(
            "path", str(tmp_path / "r")
        ).option("seq_len", 2).mode("append").save()
    ok = spark.createDataFrame([(1, [1, 2])], SHARD_SCHEMA)
    with pytest.raises(Exception, match="seq_len"):
        ok.write.format("tokenshards").option("path", str(tmp_path / "m")).mode("append").save()


def test_truncated_and_bad_magic_raise():
    with pytest.raises(ValueError, match="truncated"):
        list(_decode_shard(b"SG", "x"))
    blob = struct.pack("<8sIQ", b"NOTMAGIC", 4, 0)
    with pytest.raises(ValueError, match="bad magic"):
        list(_decode_shard(blob, "x"))
    blob = struct.pack("<8sIQ", b"SGSHARD1", 4, 2)  # claims 2 samples, has 0
    with pytest.raises(ValueError, match="header-implied"):
        list(_decode_shard(blob, "x"))


def test_overwrite_clears_stale_append_accumulates(ts_registered, tmp_path):
    spark = ts_registered
    out = str(tmp_path / "shards")
    spark.createDataFrame(_rows(40, 4), SHARD_SCHEMA).repartition(8).write.format(
        "tokenshards"
    ).option("path", out).option("seq_len", 4).mode("append").save()
    # overwrite with a smaller dataset: stale higher-numbered shards must go
    spark.createDataFrame(_rows(3, 4), SHARD_SCHEMA).repartition(1).write.format(
        "tokenshards"
    ).option("path", out).option("seq_len", 4).mode("overwrite").save()
    back = spark.read.format("tokenshards").option("path", out).load()
    assert back.count() == 3
    # append: a second job's shards coexist (job-token filenames)
    spark.createDataFrame(_rows(5, 4)[3:], SHARD_SCHEMA).repartition(1).write.format(
        "tokenshards"
    ).option("path", out).option("seq_len", 4).mode("append").save()
    assert spark.read.format("tokenshards").option("path", out).load().count() == 5


def test_fixed_width_samples_matches_python(spark):
    seq = 8
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["sample_id"], r["doc_id"], r["chunk_idx"], r["n_real"], tuple(r["tokens"]))
        for r in fixed_width_samples(docs, seq).collect()
    }
    expect = set()
    for r in docs.collect():
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        ids = []
        for t in toks:
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % POLY_P
            ids.append(h % VOCAB)
        for ci in range(0, (len(ids) + seq - 1) // seq):
            chunk = ids[ci * seq : (ci + 1) * seq]
            n_real = len(chunk)
            chunk = chunk + [PAD_ID] * (seq - n_real)
            expect.add(
                (r["doc_id"] * (1 << 20) + ci, r["doc_id"], ci, n_real, tuple(chunk))
            )
    assert got == expect
    # empty docs emit nothing; every sample is exactly seq wide
    assert all(len(t[4]) == seq for t in got)


def test_fixed_width_samples_rejects_oversized_doc_id(spark):
    # doc_id·2^20 must stay inside int64: ids >= 2^43 fail loudly instead
    # of wrapping silently in non-ANSI Spark
    import pytest
    from pyspark.sql import Row

    ok = spark.createDataFrame([Row(doc_id=(1 << 43) - 1, text="a b c")])
    assert fixed_width_samples(ok, 4).count() == 1
    bad = spark.createDataFrame([Row(doc_id=1 << 43, text="a b c")])
    with pytest.raises(Exception, match="doc_id >= 2\\^43"):
        fixed_width_samples(bad, 4).collect()
