r"""Fixed-width token-shard source/sink — the binary training-file layer.

The last step of a training-data pipeline is not parquet: dataloaders mmap
flat binary shards of fixed-length int32 token sequences (the ``.bin``
convention used by the open GPT-2/Megatron/nanoGPT data preparations).
This module writes/reads that layer through the PySpark Python
``DataSource`` API, completing the engine's crawl → archive → text →
dedup → pack → **shards** story (plans/corpus_build.py covers the stages
before this one). The reference engine has no training-file surface at
all (its outputs stay in MongoDB, storage_workflow_mongodb.go:296-335) —
this is part of the north-rule training-data extension.

Shard format (all little-endian, byte-deterministic for a given input):

- header: magic ``SGSHARD1`` (8 bytes) + uint32 ``seq_len`` + uint64
  ``n_samples``;
- then per sample: uint64 ``sample_id`` + ``seq_len`` × int32 tokens.

Sample ids ride inside the shard so a roundtrip is exact without a
sidecar, and a downstream sampler can subset/shuffle by id without
re-deriving positions.

Spark-first design mirrors sources/warc.py: one task writes one shard
(``shard-<job>-<task>.bin``, atomic ``.inprogress`` → rename publish), a
per-job token keeps append jobs collision-free while task retries stay
idempotent, overwrite-mode cleanup happens only at commit after every
task succeeded, and the reader makes one input partition per shard file —
at 100 TB: thousands of ~1 GB shards → thousands of parallel map tasks,
no driver bottleneck, no shuffle.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    ]
)

_MAGIC = b"SGSHARD1"
_HEADER = struct.Struct("<8sIQ")  # magic, seq_len, n_samples
_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1


def _decode_shard(blob: bytes, path: str) -> Iterator[tuple]:
    if len(blob) < _HEADER.size:
        raise ValueError(f"{path}: truncated shard header")
    magic, seq_len, n_samples = _HEADER.unpack_from(blob, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: bad magic {magic!r}")
    rec = struct.Struct(f"<q{seq_len}i")
    expect = _HEADER.size + n_samples * rec.size
    if len(blob) != expect:
        raise ValueError(
            f"{path}: size {len(blob)} != header-implied {expect} "
            f"(seq_len={seq_len}, n_samples={n_samples})"
        )
    pos = _HEADER.size
    for _ in range(n_samples):
        vals = rec.unpack_from(blob, pos)
        yield (vals[0], list(vals[1:]))
        pos += rec.size


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ShardReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        paths = []
        for root, _dirs, files in os.walk(self.path):
            paths.extend(
                os.path.join(root, f) for f in files if f.endswith(".bin")
            )
        return [_ShardPartition(p) for p in sorted(paths)]

    def read(self, partition: _ShardPartition):
        with open(partition.path, "rb") as fh:
            blob = fh.read()
        yield from _decode_shard(blob, partition.path)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class _ShardWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        try:
            self.seq_len = int(options["seq_len"])
        except KeyError:
            raise ValueError("tokenshards writer requires .option('seq_len', N)")
        if self.seq_len <= 0:
            raise ValueError(f"seq_len must be positive, got {self.seq_len}")
        self.job_token = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"shard-{self.job_token}-{pid:05d}.bin")
        rec = struct.Struct(f"<q{self.seq_len}i")
        n = 0
        with open(out + ".inprogress", "wb") as fh:
            fh.write(_HEADER.pack(_MAGIC, self.seq_len, 0))  # count patched below
            for row in iterator:
                toks = row.tokens
                if len(toks) != self.seq_len:
                    raise ValueError(
                        f"sample {row.sample_id}: {len(toks)} tokens, "
                        f"shard is fixed-width seq_len={self.seq_len}"
                    )
                # struct.pack range-checks each int32; re-raise with context
                try:
                    fh.write(rec.pack(row.sample_id, *toks))
                except struct.error as e:
                    raise ValueError(
                        f"sample {row.sample_id}: token out of int32 range ({e})"
                    )
                n += 1
            fh.seek(0)
            fh.write(_HEADER.pack(_MAGIC, self.seq_len, n))
        os.replace(out + ".inprogress", out)
        return _ShardCommit(out, n)

    def commit(self, messages) -> None:
        # same protocol as sources/warc.py: task files are already
        # atomically published; overwrite cleanup runs only after every
        # task succeeded, so a failed job leaves the old shards intact
        if not self.overwrite:
            return None
        keep = {m.path for m in messages if m is not None}
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                p = os.path.join(root, f)
                if f.endswith(".bin") and p not in keep:
                    os.remove(p)
        return None

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class TokenShardDataSource(DataSource):
    """``spark.read.format("tokenshards")`` / ``df.write.format("tokenshards")``.

    Register once per session::

        spark.dataSource.register(TokenShardDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "tokenshards"

    def schema(self):
        return SHARD_SCHEMA

    def reader(self, schema) -> _ShardReader:
        return _ShardReader(self.options)

    def writer(self, schema, overwrite: bool) -> _ShardWriter:
        return _ShardWriter(self.options, overwrite)


# ---------------------------------------------------------------------------
# fixed_width_samples — tokenize + chunk + pad: the projection that turns a
# text corpus into shard-ready (sample_id, tokens) rows. Token ids are the
# shared poly-hash kernel mod VOCAB (an honest stand-in for a learned BPE
# vocabulary — the id *mapping* is swappable, the chunk/pad plumbing is the
# real product). Pure codegen: tokenize once, slice fixed windows, pad the
# tail — map-only at any corpus size.
# ---------------------------------------------------------------------------

VOCAB = 1 << 15  # token ids in [0, 32768) — comfortably int32
PAD_ID = 0


def fixed_width_samples(
    docs: DataFrame, seq_len: int, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(sample_id, doc_id, chunk_idx, n_real, tokens) — every document's
    token-id stream cut into ``seq_len``-wide samples, the last one padded
    with ``PAD_ID``. ``sample_id`` = doc_id·2^20 + chunk_idx (deterministic,
    unique for corpora under 2^20 chunks/doc AND doc ids under 2^43 —
    doc_id·2^20 must stay inside int64; the crawl doc key
    round·2^32+fetch_rank satisfies this for round < 2^11, which a
    runtime assert enforces so non-ANSI Spark can never wrap silently).
    Empty documents emit no samples (mirrors
    queries/pipelineops.chunk_documents)."""
    from spider_go_spark.functions import textkernel as tk

    ids = F.transform(tk.token_hashes(F.col(text)), lambda h: (h % VOCAB).cast("int"))
    d = docs.select(F.col(doc_id).alias("doc_id"), ids.alias("ids"))
    d = d.withColumn(
        "doc_id",
        F.when(F.col("doc_id").cast("long") < (1 << 43), F.col("doc_id")).otherwise(
            F.assert_true(
                F.lit(False), F.lit("fixed_width_samples: doc_id >= 2^43 would wrap sample_id")
            ).cast("long")
        ),
    )
    d = d.withColumn("n_chunks", F.ceil(F.size("ids") / F.lit(seq_len)).cast("int"))
    d = d.filter(F.col("n_chunks") > 0).select(
        "doc_id",
        "ids",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("ids"), F.col("chunk_idx") * seq_len + 1, seq_len)
    n_real = F.size(chunk)
    padded = F.concat(
        chunk,
        F.array_repeat(F.lit(PAD_ID).cast("int"), F.lit(seq_len) - n_real),
    )
    return d.select(
        (F.col("doc_id").cast("long") * (1 << 20) + F.col("chunk_idx")).alias("sample_id"),
        "doc_id",
        "chunk_idx",
        n_real.cast("int").alias("n_real"),
        padded.alias("tokens"),
    )
