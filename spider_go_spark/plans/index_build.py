r"""Incremental inverted-index maintenance over crawl rounds.

The retrieval operators in :mod:`spider_go_spark.queries.webindex` build
their index from a full corpus scan — right for ad-hoc analytics, wrong
for a live crawl: a 10^10-doc index must absorb each round's 10^7 new
documents WITHOUT touching the other 10^10 (the reference gets this for
free from MongoDB's B-tree inserts,
/root/reference/pkg/spider/storage_workflow_mongodb.go:81-119; a
lakehouse engine has to build it). This module is that incremental path:

- **Layout**: postings live under ``<index_dir>/round=N/bucket=B/…`` —
  hive-style key=value directories, so the whole history reads back as
  ONE DataFrame with ``round`` and ``bucket`` as partition columns.
  ``bucket = term_hash mod n_buckets`` is the query-time pruning key:
  a term lookup reads only its bucket's directories (Spark partition
  pruning turns the predicate into a directory filter — the scan never
  lists the other buckets' files). At 100 TB: buckets ≫ cores, each
  round=N/bucket=B a handful of parquet files.

- **Incrementality**: ``update(rnd, docs)`` writes ONLY ``round=N/…`` —
  cost ∝ the round's postings, never the corpus. It is the
  ``CrawlEngine`` ``docs_sink`` contract (at-least-once per round,
  round number as the idempotence key): the round directory is written
  mode=overwrite, so a crash-replay redelivery replaces the same
  directory instead of doubling postings — same recipe as
  sources/warc.warc_docs_sink.

- **Search**: exact integer tf·idf over the pruned scan. df/N come from
  the pruned postings themselves plus a tiny per-round stats sidecar
  (``_stats/round=N``, one row per round), so scoring needs no full
  scan either. idf is the shared exact binary-log kernel
  (functions/intmath.log2_q20) — bit-identical in any engine, verified
  against a pure-Python replay in tests/test_index_build.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions import textkernel as tk
from spider_go_spark.functions.intmath import log2_q20

POLY_P = 1_000_000_007


class IncrementalIndexer:
    """Maintains a term-bucketed postings index, one crawl round at a time.

    Postings row: (term_h, doc_key, tf, dl) with partition columns
    (round, bucket); doc_key = round·2^32 + fetch_rank (the engine's
    deterministic document identity, SURVEY §1.3)."""

    def __init__(self, spark: SparkSession, index_dir: str, n_buckets: int = 16):
        self.spark = spark
        self.index_dir = index_dir
        self.n_buckets = n_buckets

    # -- write path ---------------------------------------------------------

    def update(self, rnd: int, docs: DataFrame) -> None:
        """Index one committed round's fetched docs (docs_sink contract:
        at-least-once, idempotent per round via directory overwrite)."""
        from spider_go_spark.functions.spans import assembled_col

        self._sweep_staging()

        th = docs.select(
            (F.col("round").cast("long") * (1 << 32) + F.col("fetch_rank"))
            .alias("doc_key"),
            tk.token_hashes(assembled_col("spans")).alias("th"),
        )
        post = (
            th.select("doc_key", F.size("th").cast("long").alias("dl"),
                      F.explode("th").alias("term_h"))
            .groupBy("term_h", "doc_key", "dl")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .withColumn("bucket", F.pmod("term_h", F.lit(self.n_buckets)).cast("int"))
            .localCheckpoint(eager=True)  # one tokenize pass feeds write + stats
        )
        post.write.partitionBy("bucket").mode("overwrite").parquet(
            os.path.join(self.index_dir, f"round={rnd}")
        )
        self._stamp_epoch(os.path.join(self.index_dir, f"round={rnd}"), 1)
        self._write_stats(rnd, post, epoch=1)

    # -- epoch markers -------------------------------------------------------
    #
    # Postings dirs and their stats sidecars are written in two separate
    # steps; a crash between them (update: data→stats; delete_docs:
    # replace→stats; sweep: promote-without-stats) leaves a round whose
    # sidecar disagrees with its postings. Each writer therefore stamps the
    # SAME integer epoch into ``round=N/_EPOCH`` and ``_stats/round=N/_EPOCH``
    # (underscore names — invisible to Spark partition discovery, like
    # _SUCCESS), and every sweep compares the two: any mismatch or missing
    # marker triggers a stats recompute FROM THE POSTINGS THEMSELVES, the
    # source of truth. Cost: O(#rounds) tiny driver-side file reads per
    # sweep; a postings re-read only on an actual detected crash.

    @staticmethod
    def _read_epoch(d: str) -> int | None:
        p = os.path.join(d, "_EPOCH")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    @staticmethod
    def _stamp_epoch(d: str, epoch: int) -> None:
        with open(os.path.join(d, "_EPOCH"), "w") as f:
            f.write(str(epoch))

    def _verify_stats(self) -> None:
        """Repair any round whose stats sidecar epoch disagrees with its
        postings dir epoch (crash between data write and stats write, or a
        stage promoted by the sweep): recompute the sidecar from the round's
        postings. Rounds with matching epochs are untouched."""
        for name in os.listdir(self.index_dir):
            if not name.startswith("round="):
                continue
            rd = os.path.join(self.index_dir, name)
            if not os.path.isdir(rd):
                continue
            rnd = int(name[len("round="):])
            rd_epoch = self._read_epoch(rd)
            st_epoch = self._read_epoch(
                os.path.join(self.index_dir, "_stats", f"round={rnd}")
            )
            if rd_epoch is not None and st_epoch == rd_epoch:
                continue
            epoch = 1 if rd_epoch is None else rd_epoch
            post = self.spark.read.parquet(rd)
            self._stamp_epoch(rd, epoch)
            self._write_stats(rnd, post, epoch=epoch)

    def _write_stats(self, rnd: int, post: DataFrame, epoch: int = 1) -> None:
        # stats are DERIVED FROM POSTINGS (docs with ≥ 1 token): update and
        # delete_docs then agree by construction, and zero-token docs —
        # invisible to retrieval — never skew N
        agg = (
            post.select("doc_key", "dl").distinct()
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_dl"),
            )
        )
        stats_dir = os.path.join(self.index_dir, "_stats", f"round={rnd}")
        agg.coalesce(1).write.mode("overwrite").parquet(stats_dir)
        # stamped AFTER the parquet (overwrite clears the dir): a crash
        # in between leaves a missing marker → next sweep recomputes
        self._stamp_epoch(stats_dir, epoch)

    def sink(self):
        """Adapter: ``CrawlEngine(docs_sink=indexer.sink())``."""

        def _sink(rnd: int, docs: DataFrame) -> None:
            self.update(rnd, docs)

        return _sink

    def delete_docs(self, doc_keys: list[int]) -> None:
        """Takedown twin of the engine's ``forget_urls``: the victims'
        postings leave the index. A doc's postings live only under its own
        round's directory (``doc_key >> 32`` IS the round), so the rewrite
        is partition-scoped: read-filter-rewrite ONLY the affected
        ``round=N`` dirs (cost ∝ those rounds, never the corpus) and their
        stats rows; every other round's files are untouched on disk.

        Crash contract: rewrites stage through an underscore-prefixed dir
        (Spark partition discovery skips ``_``/``.`` names, so a leftover
        can never corrupt the inferred ``round`` column). The
        rmtree(rd) → os.replace(tmp, rd) pair is NOT atomic — a crash
        between the two leaves only the staging dir — so every write/read
        entry point first runs :meth:`_sweep_staging`, which promotes a
        complete (``_SUCCESS``-marked) orphan stage to its round dir and
        deletes incomplete ones. Net: a crash at any point leaves the old
        round, the new round, or a recoverable stage — never a half dir."""
        import shutil

        self._sweep_staging()
        victims = set(doc_keys)
        for rnd in sorted({k >> 32 for k in victims}):
            rd = os.path.join(self.index_dir, f"round={rnd}")
            if not os.path.isdir(rd):
                continue
            keep = (
                self.spark.read.parquet(rd)  # bucket partition col inferred
                .filter(~F.col("doc_key").isin(list(victims)))
                .localCheckpoint(eager=True)  # materialize BEFORE the rewrite
            )
            tmp = self._staging_dir(rnd)
            shutil.rmtree(tmp, ignore_errors=True)
            keep.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
            epoch = (self._read_epoch(rd) or 0) + 1
            self._stamp_epoch(tmp, epoch)  # travels with the promote
            shutil.rmtree(rd)
            os.replace(tmp, rd)
            self._write_stats(rnd, keep, epoch=epoch)

    def _staging_dir(self, rnd: int) -> str:
        # underscore prefix: invisible to Spark's partition discovery
        return os.path.join(self.index_dir, f"_staging-round={rnd}")

    def _sweep_staging(self) -> None:
        """Recover/clean orphan rewrite stages left by a crash in
        delete_docs: a stage with Spark's ``_SUCCESS`` marker whose round
        dir is gone had already passed the rmtree — finish the rename;
        anything else (half-written stage, or round dir still present) is
        stale — delete it."""
        import shutil

        if not os.path.isdir(self.index_dir):
            return
        for name in os.listdir(self.index_dir):
            if not name.startswith("_staging-round="):
                continue
            tmp = os.path.join(self.index_dir, name)
            rd = os.path.join(self.index_dir, name[len("_staging-"):])
            complete = os.path.isfile(os.path.join(tmp, "_SUCCESS"))
            if complete and not os.path.isdir(rd):
                os.replace(tmp, rd)
            else:
                shutil.rmtree(tmp, ignore_errors=True)
        # After promotion/cleanup, repair any stats sidecar the crash left
        # disagreeing with its round's postings (epoch mismatch check).
        self._verify_stats()

    # -- read path ----------------------------------------------------------

    def postings(self) -> DataFrame:
        """The full postings history as one DataFrame (partition columns
        round, bucket). Predicates on either prune directories."""
        self._sweep_staging()
        return (
            self.spark.read.option("basePath", self.index_dir)
            .parquet(self.index_dir)
        )

    def corpus_stats(self) -> tuple[int, int]:
        """(n_docs, total_dl) across all indexed rounds — reads only the
        one-row-per-round stats sidecar (trustworthy after a crash because
        every sweep repairs epoch-mismatched sidecars first)."""
        self._sweep_staging()
        base = os.path.join(self.index_dir, "_stats")
        agg = (
            self.spark.read.option("basePath", base).parquet(base)
            .agg(F.sum("n_docs").alias("n"), F.sum("total_dl").alias("t"))
            .collect()[0]
        )
        return int(agg["n"] or 0), int(agg["t"] or 0)

    def search(self, terms: list[str], k: int = 10) -> DataFrame:
        """(doc_key, n_hit_terms, score_u) — exact integer tf·idf top-k for
        ``terms`` over the PRUNED scan: only the query terms' buckets are
        read (directory-level partition pruning), df comes from the pruned
        postings, N from the stats sidecar. score_u = Σ_t tf · idf_q20(t),
        idf_q20 = log2((2N)/df) in Q20 via the exact integer log kernel."""
        hashes = [_poly(t) for t in terms]
        buckets = sorted({h % self.n_buckets for h in hashes})
        n_docs, _ = self.corpus_stats()
        p = (
            self.postings()
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term_h").isin(hashes))
        )
        df_tbl = p.groupBy("term_h").agg(F.countDistinct("doc_key").alias("df"))
        scored = (
            p.join(df_tbl, "term_h")
            .withColumn("idf_q20", log2_q20(f"{2 * max(n_docs, 1)}", "df"))
            .groupBy("doc_key")
            .agg(
                F.countDistinct("term_h").cast("bigint").alias("n_hit_terms"),
                F.sum(F.col("tf") * F.col("idf_q20")).alias("score_u"),
            )
        )
        return scored.orderBy(F.col("score_u").desc(), "doc_key").limit(k)


def _poly(t: str) -> int:
    """Python twin of textkernel.poly_hash for query-term hashing."""
    h = 0
    for ch in t:
        h = (h * 31 + ord(ch)) % POLY_P
    return h
