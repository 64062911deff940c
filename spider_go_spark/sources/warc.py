r"""WARC-style web-archive source/sink via the PySpark Python DataSource API.

Real crawl engines persist fetched documents in the WARC format (ISO 28500)
so downstream consumers can replay the raw capture. The reference stores
worker output values as opaque Mongo documents
(/root/reference/pkg/spider/storage_workflow_mongodb.go:296-335); this module
is the archive-format equivalent for a Spark-native engine: an exchange
format whose records survive outside the engine's own snapshot tables.

Spark-first design: a registered Python ``DataSource`` (PySpark ≥ 4), so the
archive participates in normal DataFrame plans —
``spark.read.format("warc").load(dir)`` yields one input partition per
archive file (at 100 TB: thousands of ~1 GB warc files → thousands of
parallel map tasks, no driver bottleneck, no shuffle), and
``df.write.format("warc")`` writes one archive file per task with a
commit-message protocol (task files are self-contained; a retried task
overwrites its own deterministic filename, so speculative re-execution
cannot duplicate records).

Format notes (subset of WARC/1.0, enough for faithful replay):
- each record: ``WARC/1.0\r\n`` + header lines + ``\r\n`` + exactly
  ``Content-Length`` payload bytes + ``\r\n\r\n``;
- payload is length-delimited, NEVER sniffed — a payload containing
  ``WARC/1.0`` or blank lines round-trips bit-exactly;
- no wall-clock header is written (``WARC-Date`` is omitted): archives are
  byte-deterministic for a given input, the same reproducibility contract
  as the rest of the engine (uuidv7→(round, rank) divergence, SURVEY §1.3);
- gzip: ``.option("compression", "gzip")`` writes ``.warc.gz`` files using
  the standard web-archive convention — **each record is its own gzip
  member**, members concatenated — so tools (and a future range-reader) can
  seek to a record boundary and inflate one record without touching the
  rest of the file. Members are written with ``mtime=0``, keeping the
  byte-determinism contract. The reader accepts mixed directories of
  ``.warc`` and ``.warc.gz`` files.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# one row per WARC record; payload is opaque bytes (interleaved text+media
# corpora keep media as binary — input_hint), headers that matter are typed
WARC_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), False),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("target_uri", T.StringType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_CRLF = b"\r\n"


def _encode_record(
    record_id: str, warc_type: str, target_uri: str, content_type: str, payload: bytes
) -> bytes:
    if payload is None:
        payload = b""
    for name, v in (
        ("record_id", record_id), ("warc_type", warc_type),
        ("target_uri", target_uri), ("content_type", content_type),
    ):
        # header values are CRLF-framed: an embedded \r or \n (e.g. a
        # crafted crawled URL) would inject forged header lines / break
        # record framing at write time — reject rather than corrupt
        if "\r" in v or "\n" in v:
            raise ValueError(
                f"WARC header {name}={v!r} contains a control character"
            )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + warc_type.encode() + _CRLF
        + b"WARC-Record-ID: " + record_id.encode() + _CRLF
        + b"WARC-Target-URI: " + target_uri.encode() + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def _decode_records(blob: bytes, path: str) -> Iterator[tuple]:
    pos, n = 0, len(blob)
    while pos < n:
        end_head = blob.find(_CRLF + _CRLF, pos)
        if end_head < 0:
            raise ValueError(f"{path}: truncated WARC header at byte {pos}")
        lines = blob[pos:end_head].split(_CRLF)
        if lines[0] != b"WARC/1.0":
            raise ValueError(f"{path}: bad record marker {lines[0]!r} at byte {pos}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b": ")
            hdrs[k.decode().lower()] = v.decode()
        if "content-length" not in hdrs:
            raise ValueError(
                f"{path}: record at byte {pos} has no Content-Length header"
            )
        clen = int(hdrs["content-length"])
        body_start = end_head + 4
        payload = blob[body_start : body_start + clen]
        if len(payload) != clen or blob[body_start + clen : body_start + clen + 4] != _CRLF * 2:
            raise ValueError(f"{path}: truncated payload at byte {body_start}")
        yield (
            hdrs["warc-record-id"],
            hdrs["warc-type"],
            hdrs["warc-target-uri"],
            hdrs.get("content-type", "application/octet-stream"),
            payload,
        )
        pos = body_start + clen + 4


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):  # one task per archive file — scan parallelism
        # scales with file count, the WARC analogue of parquet splits.
        # Subdirectories (e.g. warc_docs_sink's round=N dirs) are walked,
        # so a whole crawl archive loads as one DataFrame. Plain and
        # gzipped archives can coexist in one directory tree.
        paths = []
        for root, _dirs, files in os.walk(self.path):
            paths.extend(
                os.path.join(root, f)
                for f in files
                if f.endswith(".warc") or f.endswith(".warc.gz")
            )
        return [_WarcFilePartition(p) for p in sorted(paths)]

    def read(self, partition: _WarcFilePartition):
        with open(partition.path, "rb") as fh:
            blob = fh.read()
        if partition.path.endswith(".gz"):
            import gzip

            # multi-member stream (one member per record, per convention);
            # gzip.decompress inflates every member in sequence
            blob = gzip.decompress(blob)
        yield from _decode_records(blob, partition.path)


class _WarcCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class _WarcWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        compression = options.get("compression", "none")
        if compression not in ("none", "gzip"):
            raise ValueError(
                f"unsupported WARC compression {compression!r} (none|gzip)"
            )
        self.gzip = compression == "gzip"
        # per-JOB token in the filenames: two append jobs into the same
        # directory can never collide (each contributes its own file set),
        # while WITHIN a job a speculative/retried task still rewrites its
        # own deterministic filename (last-writer-wins idempotence). The
        # token is fixed here on the driver and rides to executors in the
        # pickled writer.
        self.job_token = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _WarcCommit:
        from pyspark import TaskContext

        import gzip

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        ext = ".warc.gz" if self.gzip else ".warc"
        out = os.path.join(self.path, f"part-{self.job_token}-{pid:05d}{ext}")
        n = 0
        with open(out + ".inprogress", "wb") as fh:
            for row in iterator:
                rec = _encode_record(
                    row.record_id, row.warc_type, row.target_uri,
                    row.content_type, bytes(row.payload),
                )
                if self.gzip:
                    # one gzip member per record (standard .warc.gz layout);
                    # mtime pinned to 0 so archives stay byte-deterministic
                    rec = gzip.compress(rec, mtime=0)
                fh.write(rec)
                n += 1
        os.replace(out + ".inprogress", out)  # atomic per-task publish
        return _WarcCommit(out, n)

    def commit(self, messages) -> None:
        # task files are already atomically published; the only global step
        # is honoring overwrite mode — AFTER every task succeeded, drop any
        # pre-existing archive file this job did not write (old jobs can
        # never share filenames thanks to the job token). Deleting at
        # commit, not at write start, means a failed overwrite job leaves
        # the previous archive intact.
        if not self.overwrite:
            return None
        keep = {m.path for m in messages if m is not None}
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                p = os.path.join(root, f)
                if (f.endswith(".warc") or f.endswith(".warc.gz")) and p not in keep:
                    os.remove(p)
        return None

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` / ``df.write.format("warc")``.

    Register once per session::

        spark.dataSource.register(WarcDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema) -> _WarcReader:
        return _WarcReader(self.options)

    def writer(self, schema, overwrite: bool) -> _WarcWriter:
        return _WarcWriter(self.options, overwrite)


class _WarcStreamReader:
    """SimpleDataSourceStreamReader over a growing WARC directory tree:
    each micro-batch delivers the archive files that appeared since the
    last offset, exactly once. The offset is the sorted list of delivered
    file paths (relative to the root) — the same seen-file contract
    Spark's own file stream source keeps, honest here because the WARC
    writer publishes files atomically (``.inprogress`` → rename), so a
    listed file is always complete."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def _list(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                if f.endswith(".warc") or f.endswith(".warc.gz"):
                    out.append(os.path.relpath(os.path.join(root, f), self.path))
        return sorted(out)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _read_files(self, rels: list[str]):
        import gzip

        for rel in rels:
            p = os.path.join(self.path, rel)
            with open(p, "rb") as fh:
                blob = fh.read()
            if p.endswith(".gz"):
                blob = gzip.decompress(blob)
            yield from _decode_records(blob, p)

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        now = self._list()
        new = [r for r in now if r not in seen]
        # materialized, not a generator: the runner pickles the batch's
        # records for prefetch/replay (micro-batch-sized, bounded by how
        # many archives appeared since the last trigger)
        return iter(list(self._read_files(new))), {"seen": now}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: exactly the files that joined between the
        # two offsets, in the same sorted order
        seen = set(start.get("seen", []))
        return iter(list(
            self._read_files([r for r in end.get("seen", []) if r not in seen])
        ))

    def commit(self, end: dict) -> None:
        return None


class WarcStreamDataSource(DataSource):
    """``spark.readStream.format("warcstream").option("path", dir)`` — the
    streaming twin of :class:`WarcDataSource`'s batch reader: replays an
    archive directory as it grows (e.g. ``warc_docs_sink``'s ``round=N``
    dirs appearing per crawl round) with checkpointed exactly-once file
    delivery. Register once per session::

        spark.dataSource.register(WarcStreamDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "warcstream"

    def schema(self):
        return WARC_SCHEMA

    def simpleStreamReader(self, schema) -> _WarcStreamReader:
        return _WarcStreamReader(self.options)


def fetched_docs_as_warc(docs: DataFrame) -> DataFrame:
    """Project the engine's FETCHED_DOCS rows into WARC record rows.

    Record id is the deterministic ``<urn:doc:{doc_id}>`` (≙ the reference's
    uuidv7 message ids, SURVEY §1.3 divergence note); the payload is the
    interleaved span stream serialized as length-safe JSON bytes — media
    spans keep their ``media_ref`` so a replay can re-join sidecar binaries.
    """
    return docs.select(
        F.concat(F.lit("<urn:doc:"), F.col("doc_id"), F.lit(">")).alias("record_id"),
        F.lit("response").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit("application/json; charset=utf-8").alias("content_type"),
        F.encode(F.to_json(F.struct("status", "spans")), "utf-8").alias("payload"),
    )


def fetched_docs_as_wet(docs: DataFrame) -> DataFrame:
    """Project FETCHED_DOCS rows into WET-style ``conversion`` records —
    the text-extraction derivative large crawls publish beside their
    response archives: ``text/plain`` payload = the document's
    reading-order assembled text (``functions/spans.assembled_col`` —
    text spans joined in offset order, media/link spans as typed
    placeholder tokens). One record per doc; pure codegen projection, so
    producing the WET layer costs one map-only pass at any corpus size."""
    from spider_go_spark.functions.spans import assembled_col

    return docs.select(
        F.concat(F.lit("<urn:wet:"), F.col("doc_id"), F.lit(">")).alias("record_id"),
        F.lit("conversion").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit("text/plain; charset=utf-8").alias("content_type"),
        F.encode(assembled_col("spans"), "utf-8").alias("payload"),
    )


def fetched_docs_as_wat(docs: DataFrame) -> DataFrame:
    """Project FETCHED_DOCS rows into WAT-style ``metadata`` records — the
    third member of the archive triple large crawls publish (response WARC
    + WAT metadata + WET text). The ``application/json`` payload carries
    the per-capture envelope a link-graph or index builder consumes
    WITHOUT touching the response bytes: target URL/host/status, the
    outgoing link list, and span-structure counts (text/image/video/link
    runs and total text length), all computed by higher-order functions
    over the span stream. Pure codegen projection — the WAT layer costs
    one map-only pass at any corpus size."""

    def _count(kind: str):
        return F.size(F.filter("spans", lambda s: s["kind"] == F.lit(kind)))

    meta = F.struct(
        F.col("url").alias("target_uri"),
        F.col("host").alias("host"),
        F.col("status").alias("status"),
        F.col("round").alias("round"),
        F.col("out_links").alias("links"),
        F.struct(
            _count("text").alias("text"),
            _count("image").alias("image"),
            _count("video").alias("video"),
            _count("link").alias("link"),
        ).alias("span_counts"),
        F.aggregate(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            F.lit(0),
            lambda acc, s: acc + F.length(s["text"]),
        ).alias("text_len"),
    )
    return docs.select(
        F.concat(F.lit("<urn:wat:"), F.col("doc_id"), F.lit(">")).alias("record_id"),
        F.lit("metadata").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit("application/json; charset=utf-8").alias("content_type"),
        F.encode(F.to_json(meta), "utf-8").alias("payload"),
    )


def warc_docs_sink(root: str):
    """A ``CrawlEngine(docs_sink=...)`` adapter archiving each committed
    round's fetched docs as a WARC directory (``<root>/round=N/``).

    Exactly-once composes: the engine acks each delivered round, and the
    rare redelivery (crash between sink write and ack) runs in OVERWRITE
    mode, so the round directory is replaced — never doubled — while
    within a delivery the writer's deterministic per-task filenames make
    task retries idempotent. Register the datasource on the session
    before crawling."""

    def sink(rnd: int, docs: DataFrame) -> None:
        fetched_docs_as_warc(docs).write.format("warc").option(
            "path", os.path.join(root, f"round={rnd}")
        ).mode("overwrite").save()

    return sink
