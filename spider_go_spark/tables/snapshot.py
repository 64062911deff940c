"""Snapshot-versioned Parquet table layer (the Iceberg commit model, minimal).

The north rule specifies Iceberg tables; this sandbox has no Iceberg runtime
jar, so this module implements the same commit model in miniature
(SURVEY.md §7.2):

- a table is a directory of immutable Parquet data directories plus a
  ``_manifests/`` directory of JSON snapshot manifests,
- a snapshot manifest lists the data directories that are members of that
  snapshot (plus row counts and arbitrary properties),
- a commit = write data files, then atomically rename a temp manifest into
  place — readers only ever see fully-committed snapshots,
- reads resolve the latest (or an explicitly pinned) manifest.

This gives atomic round commits and time-travel for bit-identical resume.
The API is kept Iceberg-shaped (``catalog.load(name)``, ``.append(df)``,
``.snapshot(id)``) so a real ``iceberg-spark-runtime`` catalog becomes a
config switch when the jar is available.

Reference analogue: the Mongo collections + NATS streams that hold all
spider-go state (/root/reference/pkg/spider/nats.go:118-128,
storage_workflow_mongodb.go:57-80) — replaced by durable, versioned,
columnar tables (the reference's in-memory streams lose data on restart;
nats.go:155-158).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this snapshot id first. The engine's
    contract is one driver loop per table root (SURVEY §2.10); this error
    ENFORCES it instead of assuming it — a stray second engine loses the
    race cleanly (its staged data dirs are unreferenced and swept by
    expiry) rather than silently overwriting a committed manifest."""


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    data_dirs: list[str]  # relative to table root
    row_count: int
    properties: dict
    # hash-bucket partitioned tables (the Iceberg bucket-transform model):
    # bucket id → list of data dirs holding that bucket's rows. data_dirs is
    # always the flat union, so readers/expiry work identically either way.
    bucket_dirs: dict[int, list[str]] | None = None
    bucket_rows: dict[int, int] | None = None  # bucket id → row count

    @property
    def empty(self) -> bool:
        return not self.data_dirs


class SnapshotTable:
    """One snapshot-versioned table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # -- snapshot resolution -------------------------------------------------
    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{snapshot_id:09d}.json")

    def snapshot_ids(self) -> list[int]:
        names = os.listdir(os.path.join(self.path, _MANIFEST_DIR))
        return sorted(int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json"))

    def current_snapshot_id(self) -> int | None:
        ids = self.snapshot_ids()
        return ids[-1] if ids else None

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return Snapshot(-1, [], 0, {})
        with open(self._manifest_path(snapshot_id)) as f:
            m = json.load(f)
        bd = m.get("bucket_dirs")
        br = m.get("bucket_rows")
        if bd is not None:
            bd = {int(k): v for k, v in bd.items()}
        if br is not None:
            br = {int(k): v for k, v in br.items()}
        return Snapshot(
            m["snapshot_id"], m["data_dirs"], m["row_count"], m.get("properties", {}), bd, br
        )

    # -- reads ---------------------------------------------------------------
    def read(self, snapshot_id: int | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        if snap.empty:
            return self.spark.createDataFrame([], self.schema)
        paths = [os.path.join(self.path, d) for d in snap.data_dirs]
        return self.spark.read.schema(self.schema).parquet(*paths)

    # -- commits -------------------------------------------------------------
    def _next_snapshot_id(self) -> int:
        cur = self.current_snapshot_id()
        return 0 if cur is None else cur + 1

    def _referenced_dirs(self) -> set[str]:
        refs: set[str] = set()
        for sid in self.snapshot_ids():
            refs.update(self.snapshot(sid).data_dirs)
        return refs

    def _commit(
        self,
        data_dirs: list[str],
        row_count: int,
        properties: dict | None,
        bucket_dirs: dict[int, list[str]] | None = None,
        bucket_rows: dict[int, int] | None = None,
    ) -> Snapshot:
        new_id = self._next_snapshot_id()
        manifest = {
            "snapshot_id": new_id,
            "data_dirs": data_dirs,
            "row_count": row_count,
            "properties": properties or {},
        }
        if bucket_dirs is not None:
            manifest["bucket_dirs"] = {str(k): v for k, v in sorted(bucket_dirs.items())}
        if bucket_rows is not None:
            manifest["bucket_rows"] = {str(k): v for k, v in sorted(bucket_rows.items())}
        # manifest-epoch CAS: the commit point is os.link, which fails with
        # EEXIST if vN already exists — so of two racing writers that both
        # derived N from head N-1, exactly one wins; the loser raises
        # instead of replacing the winner's manifest (os.rename would).
        # The tmp name is writer-unique so racing stages never clobber.
        tmp = f"{self._manifest_path(new_id)}.tmp-{os.getpid()}-{id(self):x}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(new_id))  # atomic commit point
        except FileExistsError:
            os.remove(tmp)
            raise ConcurrentCommitError(
                f"snapshot {new_id} at {self.path} was committed by another "
                "writer; this table root has a single-writer contract"
            ) from None
        os.remove(tmp)
        return Snapshot(new_id, data_dirs, row_count, properties or {}, bucket_dirs, bucket_rows)

    def _write_data(self, df: DataFrame, label: str, partition_by: str | None = None) -> tuple[str, int]:
        # bind the dir name to the snapshot id it will commit as: labels may
        # repeat (e.g. a seed-ingestion round reusing a round number), and a
        # bare-label dir could collide with a LIVE dir of the current
        # snapshot — deleting that while a lazy overwrite() input is still
        # reading it corrupts the table
        rel = os.path.join(_DATA_DIR, f"{label}-v{self._next_snapshot_id():09d}")
        out = os.path.join(self.path, rel)
        if os.path.exists(out):
            # bucketed commits reference subdirs (rel/__bucket=K), so match
            # by prefix, not equality
            if any(r == rel or r.startswith(rel + "/") for r in self._referenced_dirs()):
                # never true for a correct single-writer; guard against
                # deleting committed data
                raise RuntimeError(f"refusing to overwrite committed data dir {rel}")
            shutil.rmtree(out)  # failed earlier attempt — never committed
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        # row count via observe(): the WRITE job itself reports it — no
        # second count job, and no driver-side metadata reads (walking every
        # written file's footer on the driver serializes commits behind
        # thousands of storage round-trips at 10^7-row rounds)
        obs = Observation()
        writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        return rel, int(obs.get["rows"])

    def _bucket_file_rows(self, bucket_rel_dirs: dict[int, str]) -> dict[int, int]:
        """Per-bucket row counts for a just-written bucketed data dir, from
        Parquet footers read in ONE distributed job (metadata-only — the
        footer carries num_rows; no data pages move). The driver only LISTS
        the files (one listing per bucket dir); opening every footer
        serially on the driver is the anti-pattern this replaces. A real
        Iceberg catalog records these counts in its own manifests at write
        time; this is the minimal equivalent for the miniature commit
        model."""
        tasks: list[tuple[int, str]] = []
        for b, d in bucket_rel_dirs.items():
            root = os.path.join(self.path, d)
            for r, _dd, files in os.walk(root):
                for fname in files:
                    if fname.endswith(".parquet"):
                        tasks.append((int(b), os.path.join(r, fname)))
        out = {int(b): 0 for b in bucket_rel_dirs}
        if not tasks:
            return out

        def footer_rows(t):
            import pyarrow.parquet as pq

            b, p = t
            return b, pq.ParquetFile(p).metadata.num_rows

        n_slices = max(1, min(len(tasks), self.spark.sparkContext.defaultParallelism))
        for b, n in (
            self.spark.sparkContext.parallelize(tasks, n_slices).map(footer_rows).collect()
        ):
            out[b] += n
        return out

    def append(self, df: DataFrame, label: str, properties: dict | None = None) -> Snapshot:
        """Append ``df`` as a new data dir named ``label`` (e.g. round-000007)."""
        rel, n = self._write_data(df, label)
        snap = self.snapshot()
        return self._commit(snap.data_dirs + [rel], snap.row_count + n, properties)

    def overwrite(self, df: DataFrame, label: str, properties: dict | None = None) -> Snapshot:
        """Replace table contents with ``df`` (new snapshot; old dirs retained
        for time-travel until expired)."""
        rel, n = self._write_data(df, label)
        return self._commit([rel], n, properties)

    # -- hash-bucket partitioned commits (Iceberg bucket-transform model) ----
    def read_buckets(self, bucket_ids, snapshot_id: int | None = None) -> DataFrame:
        """Read ONLY the given buckets' data dirs — the partition-pruned scan
        that makes partition-scoped rewrites cheap (untouched buckets are
        neither read nor written)."""
        snap = self.snapshot(snapshot_id)
        bd = snap.bucket_dirs or {}
        paths = [
            os.path.join(self.path, d) for b in bucket_ids for d in bd.get(int(b), [])
        ]
        if not paths:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*paths)

    def read_buckets_tagged(
        self, bucket_ids=None, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read buckets (default: all) with a ``__bucket`` literal column
        recovered from the manifest mapping — for rewrites that must
        preserve rows' EXISTING bucket placement without recomputing the
        bucket transform (e.g. carrying other tenants' rows through a
        rebalance, or a scoped delete on a table whose bucket id encodes
        state beyond a pure hash of the row)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        snap = self.snapshot(snapshot_id)
        bd = snap.bucket_dirs or {}
        ids = sorted(bd) if bucket_ids is None else sorted(
            b for b in (int(x) for x in bucket_ids) if b in bd
        )
        parts = [
            self.read_buckets([b], snapshot_id).withColumn("__bucket", F.lit(b).cast("int"))
            for b in ids
        ]
        if not parts:
            schema = T.StructType(
                list(self.schema.fields) + [T.StructField("__bucket", T.IntegerType(), False)]
            )
            return self.spark.createDataFrame([], schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def replace_buckets(
        self,
        df: DataFrame,
        touched,
        label: str,
        bucket_col: str = "__bucket",
        properties: dict | None = None,
    ) -> Snapshot:
        """Commit a partition-scoped rewrite: ``df`` (which carries
        ``bucket_col``) REPLACES the listed ``touched`` buckets; every other
        bucket's dirs carry over into the new snapshot untouched — never
        re-read, never re-written (the Iceberg overwrite-by-partition-filter
        model). A touched bucket with no rows in ``df`` simply disappears.

        The data is written once, partitioned by ``bucket_col`` (the bucket
        value lives in the subdir name, not in the files — the column is
        derivable, e.g. pmod(url_hash, P), so readers reconstruct it)."""
        touched = {int(b) for b in touched}
        prev = self.snapshot()
        prev_bd = dict(prev.bucket_dirs or {})
        prev_br = dict(prev.bucket_rows or {})
        if prev.data_dirs and prev.bucket_dirs is None:
            raise RuntimeError(
                "replace_buckets on a table with non-bucketed data: the "
                "existing rows have no bucket mapping to carry over"
            )
        rel, _n = self._write_data(df, label, partition_by=bucket_col)
        out = os.path.join(self.path, rel)
        written: dict[int, list[str]] = {}
        for d in sorted(os.listdir(out)):
            if d.startswith(bucket_col + "="):
                b = int(d.split("=", 1)[1])
                written[b] = [os.path.join(rel, d)]
        written_rows = self._bucket_file_rows({b: ds[0] for b, ds in written.items()})
        stray = set(written) - touched
        if stray:
            raise RuntimeError(
                f"replace_buckets: df contains rows in undeclared buckets {sorted(stray)}"
            )
        new_bd = {b: dirs for b, dirs in prev_bd.items() if b not in touched}
        new_br = {b: prev_br.get(b, 0) for b in new_bd}
        new_bd.update(written)
        new_br.update(written_rows)
        data_dirs = sorted(d for dirs in new_bd.values() for d in dirs)
        return self._commit(
            data_dirs, sum(new_br.values()), properties,
            bucket_dirs=new_bd, bucket_rows=new_br,
        )

    def append_buckets(
        self,
        df: DataFrame,
        touched,
        label: str,
        bucket_col: str = "__bucket",
        properties: dict | None = None,
    ) -> Snapshot:
        """Commit a bucket-scoped APPEND: ``df``'s rows are ADDED to the
        listed ``touched`` buckets (each written bucket gains one new data
        dir; its existing dirs are neither read nor rewritten). The
        bucketed complement of :meth:`append` — write cost is O(new rows)
        like a flat append, but readers get :meth:`read_buckets` pruning.

        This is the right shape for an append-mostly table that is probed
        by key (e.g. a 10^10-row seen set verified per round against a few
        hash shards): a flat append gives cheap writes but O(table) probe
        scans; replace_buckets gives pruned scans but O(bucket) rewrites
        per commit. Bucket-scoped appends give both; per-bucket dir counts
        then grow one per commit, which :meth:`compact` folds back to one
        (maintenance cadence amortizes it).
        """
        touched = {int(b) for b in touched}
        prev = self.snapshot()
        if prev.data_dirs and prev.bucket_dirs is None:
            raise RuntimeError(
                "append_buckets on a table with non-bucketed data: the "
                "existing rows have no bucket mapping to merge into"
            )
        rel, _n = self._write_data(df, label, partition_by=bucket_col)
        out = os.path.join(self.path, rel)
        new_bd = {b: list(dirs) for b, dirs in (prev.bucket_dirs or {}).items()}
        new_br = dict(prev.bucket_rows or {})
        added: dict[int, str] = {}
        for d in sorted(os.listdir(out)):
            if d.startswith(bucket_col + "="):
                b = int(d.split("=", 1)[1])
                if b not in touched:
                    raise RuntimeError(
                        f"append_buckets: df contains rows in undeclared bucket {b}"
                    )
                added[b] = os.path.join(rel, d)
        added_rows = self._bucket_file_rows(added)
        for b, d in added.items():
            new_bd.setdefault(b, []).append(d)
            new_br[b] = new_br.get(b, 0) + added_rows[b]
        data_dirs = sorted(d for dirs in new_bd.values() for d in dirs)
        return self._commit(
            data_dirs, sum(new_br.values()), properties,
            bucket_dirs=new_bd, bucket_rows=new_br,
        )

    def compact(
        self,
        label: str = "compact",
        target_partitions: int | None = None,
        properties: dict | None = None,
    ) -> Snapshot:
        """Rewrite the current snapshot's data into fresh consolidated dirs
        (Iceberg's ``rewrite_data_files`` maintenance action). Row content
        is unchanged — only the file layout.

        Why this is first-class at scale: an append table accumulates one
        data dir per round (a year of hourly rounds = ~9k dirs, each with
        shuffle-partition-count files), and every read unions all of them —
        planning cost and open-file count grow without bound. Compaction
        folds them into one dir; ``expire_snapshots`` then reclaims the old
        dirs once they fall out of the retention window.

        Bucketed tables compact per bucket (each bucket's dirs merge into
        a single-file bucket partition via a hash repartition on the bucket
        id — map-side from the reader's perspective, one shuffle total);
        flat tables rewrite as one dir, optionally coalesced to
        ``target_partitions`` files (default: leave Spark's partitioning —
        at 100 TB you target file size, not file count 1).
        """
        from pyspark.sql import functions as F

        snap = self.snapshot()
        if snap.empty:
            return snap
        props = dict(snap.properties)
        props.update(properties or {})
        props["compacted_from_snapshot"] = snap.snapshot_id
        if snap.bucket_dirs is not None:
            df = self.read_buckets_tagged()
            # hash-repartition on the bucket id: each bucket lands in exactly
            # one task, so partitionBy emits exactly one file per bucket
            n_parts = target_partitions or max(len(snap.bucket_dirs), 1)
            df = df.repartition(n_parts, "__bucket")
            return self.replace_buckets(
                df, touched=set(snap.bucket_dirs), label=label, properties=props
            )
        df = self.read()
        if target_partitions:
            df = df.coalesce(target_partitions)
        rel, n = self._write_data(df, label)
        if n != snap.row_count:
            raise RuntimeError(
                f"compaction row drift: {snap.row_count} -> {n} (refusing to commit)"
            )
        return self._commit([rel], n, props)

    def compact_buckets(
        self,
        min_dirs: int = 2,
        label: str = "compact-buckets",
        properties: dict | None = None,
    ) -> "Snapshot | None":
        """Partition-scoped manifest + layout fold for APPEND-bucketED
        tables: rewrite ONLY the buckets whose dir chains hold
        ``min_dirs``+ entries into one dir each; every other bucket carries
        over into the new snapshot without being read or written.

        Why this exists next to :meth:`compact`: bucket-scoped appends grow
        one manifest dir entry per (round, bucket), so after R rounds the
        manifest is O(R·B) — read and rewritten by the driver on EVERY
        commit, a metadata scale-killer at the 10^10-URL design point long
        before the data itself hurts. A full ``compact()`` folds the
        manifest but re-reads and re-writes the WHOLE table; this fold
        costs only the rows in the overgrown buckets, so maintenance can
        run it every round and keep the manifest at O(buckets · min_dirs)
        forever. Returns None when no bucket chain reached the threshold
        (no commit made)."""
        from pyspark.sql import functions as F  # noqa: F401  (parity w/ compact)

        snap = self.snapshot()
        if snap.bucket_dirs is None:
            return None
        touched = {b for b, dirs in snap.bucket_dirs.items() if len(dirs) >= min_dirs}
        if not touched:
            return None
        props = dict(snap.properties)
        props.update(properties or {})
        props["compacted_from_snapshot"] = snap.snapshot_id
        df = self.read_buckets_tagged(touched)
        # one task per touched bucket → exactly one file+dir per bucket
        df = df.repartition(max(len(touched), 1), "__bucket")
        before = sum((snap.bucket_rows or {}).get(b, 0) for b in touched)
        out = self.replace_buckets(df, touched=touched, label=label, properties=props)
        after = sum((out.bucket_rows or {}).get(b, 0) for b in touched)
        if before != after:
            raise RuntimeError(
                f"bucket compaction row drift in {sorted(touched)}: "
                f"{before} -> {after} (table left on the new snapshot for "
                "inspection; roll back with rollback_to)"
            )
        return out

    def data_file_stats(self) -> dict:
        """Layout health of the current snapshot: dir/file counts and bytes
        — the numbers a maintenance scheduler thresholds on."""
        snap = self.snapshot()
        n_files = 0
        n_bytes = 0
        for rel in snap.data_dirs:
            root = os.path.join(self.path, rel)
            for r, _d, files in os.walk(root):
                for fname in files:
                    if fname.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(r, fname))
        return {
            "snapshot_id": snap.snapshot_id,
            "n_data_dirs": len(snap.data_dirs),
            "n_files": n_files,
            "n_bytes": n_bytes,
            "row_count": snap.row_count,
        }

    def history(self) -> list[dict]:
        """Commit log over the retained snapshots (id, rows, layout,
        properties) — ≙ Iceberg's ``table.history()`` metadata table."""
        out = []
        for sid in self.snapshot_ids():
            s = self.snapshot(sid)
            out.append(
                {
                    "snapshot_id": sid,
                    "row_count": s.row_count,
                    "n_data_dirs": len(s.data_dirs),
                    "properties": s.properties,
                }
            )
        return out

    def read_incremental(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Iceberg-style incremental append scan: ONLY the rows committed
        after ``from_snapshot_id`` up to ``to_snapshot_id`` (default:
        current), read from just the data dirs those commits added — a
        downstream consumer (doc indexer, training-data exporter) processes
        each round's new rows without rescanning the table. At 100 TB this
        is the difference between a per-round delta job and a full-table
        read per round.

        ``from_snapshot_id=-1`` means "from the beginning". Like Iceberg's
        incremental read, the range must contain only APPEND commits: an
        overwrite/replace_buckets/compact commit rewrites membership, so
        "new dirs" no longer means "new rows" — that raises ValueError and
        the consumer falls back to a full scan (or the changelog a real
        deployment would keep)."""
        ids = self.snapshot_ids()
        if to_snapshot_id is None:
            to_snapshot_id = ids[-1] if ids else -1
        if from_snapshot_id == to_snapshot_id:
            return self.spark.createDataFrame([], self.schema)
        if from_snapshot_id != -1 and from_snapshot_id not in ids:
            raise ValueError(
                f"from_snapshot_id {from_snapshot_id} not retained "
                f"(expired or never committed); full scan required"
            )
        prev_dirs = (
            set() if from_snapshot_id == -1 else set(self.snapshot(from_snapshot_id).data_dirs)
        )
        base = prev_dirs
        new_dirs: list[str] = []
        for sid in ids:
            if not (from_snapshot_id < sid <= to_snapshot_id):
                continue
            cur = self.snapshot(sid)
            cur_dirs = set(cur.data_dirs)
            if not base <= cur_dirs:
                raise ValueError(
                    f"snapshot {sid} is not an append commit (data dirs were "
                    f"removed/replaced); incremental read undefined across it"
                )
            new_dirs.extend(sorted(cur_dirs - base))
            base = cur_dirs
        if not new_dirs:
            return self.spark.createDataFrame([], self.schema)
        paths = [os.path.join(self.path, d) for d in new_dirs]
        return self.spark.read.schema(self.schema).parquet(*paths)

    def rollback_to(self, snapshot_id: int) -> None:
        """Drop all manifests newer than ``snapshot_id`` (resume support)."""
        for sid in self.snapshot_ids():
            if sid > snapshot_id:
                os.remove(self._manifest_path(sid))

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """Retention: delete manifests (and unreferenced data dirs) beyond the
        last ``keep_last`` snapshots. ≙ the reference's 1h stream retention
        (nats.go:149-158), but explicit and durable."""
        ids = self.snapshot_ids()
        if len(ids) <= keep_last:
            return
        keep_ids = set(ids[-keep_last:])
        referenced: set[str] = set()
        for sid in keep_ids:
            referenced.update(self.snapshot(sid).data_dirs)
        for sid in ids:
            if sid not in keep_ids:
                os.remove(self._manifest_path(sid))
        data_root = os.path.join(self.path, _DATA_DIR)
        for d in os.listdir(data_root):
            rel = os.path.join(_DATA_DIR, d)
            # bucketed snapshots reference subdirs (rel/__bucket=K): the
            # top-level dir is live if it or any child is referenced
            if not any(r == rel or r.startswith(rel + "/") for r in referenced):
                shutil.rmtree(os.path.join(data_root, d))


class Catalog:
    """A directory of SnapshotTables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def load(self, name: str, schema: T.StructType) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.root, name), schema)
