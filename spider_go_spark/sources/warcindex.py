r"""CDX-style capture index over WARC archives: distributed index build +
byte-range point reads.

Web archives pair every ``.warc(.gz)`` file set with a CDX index — one row
per record keyed by SURT (host-reversed sort-friendly URL), carrying the
record's ``(file, offset, length)`` — so a capture lookup is a key-range
scan over the index plus ONE byte-range read, never an archive scan
(openwayback/pywb convention; the reference has no archive surface at all,
its captures live as opaque Mongo rows,
/root/reference/pkg/spider/storage_workflow_mongodb.go:296-335).

Scale shape:
- **index build** is one map-only pass: one task per archive file (same
  parallelism contract as :mod:`spider_go_spark.sources.warc`), each task
  walking record framing WITHOUT decoding payloads beyond the header block.
  For ``.warc.gz`` the walk is member-by-member (the writer emits one gzip
  member per record precisely so offsets exist), and the recorded
  ``(offset, length)`` is the COMPRESSED member range — the slice a point
  read fetches.
- **lookup** is a SURT prefix range filter over the index (sorted/bucketed
  by ``surt_key`` at real scale → partition-pruned range scan) followed by
  per-hit :func:`read_record` byte-range reads — O(hits), independent of
  archive size. On object storage the slice maps to one ranged GET.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_go_spark.sources.warc import _CRLF, _decode_records

CDX_SCHEMA = T.StructType(
    [
        T.StructField("surt_key", T.StringType(), False),
        T.StructField("target_uri", T.StringType(), False),
        T.StructField("record_id", T.StringType(), False),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("file", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("compressed", T.BooleanType(), False),
    ]
)


def _walk_plain(blob: bytes, path: str) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, length, record_bytes) for each record of a plain
    ``.warc`` blob — the same length-delimited framing contract as
    ``warc._decode_records``, tracked with byte positions."""
    pos, n = 0, len(blob)
    while pos < n:
        end_head = blob.find(_CRLF + _CRLF, pos)
        if end_head < 0:
            raise ValueError(f"{path}: truncated WARC header at byte {pos}")
        clen = None
        for ln in blob[pos:end_head].split(_CRLF)[1:]:
            k, _, v = ln.partition(b": ")
            if k.lower() == b"content-length":
                clen = int(v)
        if clen is None:
            raise ValueError(f"{path}: record at byte {pos} has no Content-Length")
        end = end_head + 4 + clen + 4
        if end > n:
            raise ValueError(f"{path}: truncated payload at byte {end_head + 4}")
        yield pos, end - pos, blob[pos:end]
        pos = end


def _walk_gzip_members(blob: bytes, path: str) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, inflated_bytes) per gzip member of
    a ``.warc.gz`` blob (one member = one record, the writer's layout)."""
    import zlib

    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(blob[pos:])
        except zlib.error as e:
            raise ValueError(f"{path}: bad gzip member at byte {pos}: {e}") from e
        if not d.eof:
            raise ValueError(f"{path}: truncated gzip member at byte {pos}")
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, data
        pos += consumed


def _index_file(path: str) -> Iterator[tuple]:
    from spider_go_spark.functions.urls import surt_key_one

    with open(path, "rb") as fh:
        blob = fh.read()
    compressed = path.endswith(".gz")
    walker = _walk_gzip_members if compressed else _walk_plain
    for offset, length, rec_bytes in walker(blob, path):
        for rid, wtype, uri, ctype, _payload in _decode_records(rec_bytes, path):
            yield (
                surt_key_one(uri), uri, rid, wtype, ctype,
                path, offset, length, compressed,
            )


def build_cdx(spark: SparkSession, archive_dir: str) -> DataFrame:
    """Build the CDX index DataFrame for every ``.warc``/``.warc.gz`` file
    under ``archive_dir``. One task per file (driver touches only the file
    LISTING, never file contents); each task emits its records' byte
    ranges. Sort/bucket the result by ``surt_key`` before persisting so
    lookups prune."""
    paths = []
    for root, _dirs, files in os.walk(archive_dir):
        paths.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".warc") or f.endswith(".warc.gz")
        )
    if not paths:
        return spark.createDataFrame([], CDX_SCHEMA)

    import pandas as pd

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in CDX_SCHEMA.fields]
        for pdf in batches:
            for p in pdf["path"]:
                rows = list(_index_file(str(p)))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    files_df = spark.createDataFrame(
        [(p,) for p in sorted(paths)], "path string"
    ).repartition(len(paths), "path")
    return files_df.mapInPandas(scan, CDX_SCHEMA)


def cdx_prefix(index: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures whose SURT key starts with ``surt_prefix`` — a sort-key
    RANGE predicate (``>= p AND < p+chr_max``), not a ``startswith`` scan,
    so a surt-sorted/bucketed index answers it with partition pruning."""
    hi = surt_prefix + "￿"
    return index.filter(
        (F.col("surt_key") >= surt_prefix) & (F.col("surt_key") < hi)
    )


def read_record(path: str, offset: int, length: int, compressed: bool) -> tuple:
    """Point read of ONE capture: seek to the index's byte range, read
    exactly ``length`` bytes, inflate the single gzip member if compressed,
    and decode the one record inside. Returns the same 5-tuple as the warc
    reader: (record_id, warc_type, target_uri, content_type, payload)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        chunk = fh.read(length)
    if len(chunk) != length:
        raise ValueError(f"{path}: short read at {offset}+{length}")
    if compressed:
        import gzip

        chunk = gzip.decompress(chunk)
    recs = list(_decode_records(chunk, path))
    if len(recs) != 1:
        raise ValueError(
            f"{path}: byte range {offset}+{length} holds {len(recs)} records"
        )
    return recs[0]


def fetch_captures(index_hits: DataFrame) -> DataFrame:
    """Distributed point reads for a (small, pre-filtered) set of index
    hits: one Arrow batch stage, each row one byte-range read. At scale the
    hit set is the output of :func:`cdx_prefix` — O(hits) I/O total."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("surt_key", T.StringType(), False),
            T.StructField("record_id", T.StringType(), False),
            T.StructField("warc_type", T.StringType(), False),
            T.StructField("target_uri", T.StringType(), False),
            T.StructField("content_type", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rid, wtype, uri, ctype, payload = read_record(
                    r.file, int(r.offset), int(r.length), bool(r.compressed)
                )
                rows.append((r.surt_key, rid, wtype, uri, ctype, payload))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in out_schema.fields]
                )

    return index_hits.select(
        "surt_key", "file", "offset", "length", "compressed"
    ).mapInPandas(fetch, out_schema)
