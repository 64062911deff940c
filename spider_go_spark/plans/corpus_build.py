"""End-to-end corpus build: crawl → archive triple → text layer → quality
gate → dedup → packed training samples, as ONE composed plan.

This is the product story the individual operators exist for — what a
user of the reference (a crawl/workflow engine) plus a training-data team
actually runs nightly. Each stage is an operator that already carries its
own oracle/test; this module contributes the COMPOSITION: stage wiring,
the stage-count manifest (the funnel report every corpus release ships
with), and idempotent on-disk layout.

Stages
------
1. **Crawl** — ``CrawlEngine.crawl`` (plans/round_loop.py): the exactly-
   once round loop over the synthetic web graph.
2. **Archive** — the WARC/WAT/WET triple (sources/warc.py) under
   ``<out>/archive/{warc,wat,wet}``: response bytes, metadata envelopes,
   extracted text — written once from the same docs scan.
3. **Text layer** — reading-order assembled text per doc
   (functions/spans.assembled_col), a pure projection.
4. **Quality gate** — Gopher rule flags (queries/curation.gopher_flags),
   keep = all rules pass; per-rule reject counts go into the manifest.
5. **Exact dedup** — first-seen (min (round, fetch_rank), tie-broken by
   doc_id) per ``content_hash``: the argmin-by-struct shape, one hash agg,
   no window over the corpus.
6. **Pack** — token-budget multimodal packing (functions/spans.pack_spans)
   of the surviving docs into fixed-budget training samples, written as
   the final corpus parquet under ``<out>/corpus``.

Scale shape: stages 2-6 are each either a pure projection or a single
hash agg / broadcast-sized join over the fetched-docs scan — composing
them adds NO new shuffle class beyond what the member operators already
pay, and Spark pipelines the stage-4 projection into the stage-5 agg
within one job. The manifest counts ride on the same actions via
``observe`` where a count is needed mid-plan (no extra scans).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.plans.round_loop import CrawlConfig, CrawlEngine


@dataclass(frozen=True)
class CorpusBuildResult:
    manifest: dict
    corpus_path: str


def _archive_triple(docs: DataFrame, root: str) -> None:
    from spider_go_spark.sources.warc import (
        WarcDataSource,
        fetched_docs_as_warc,
        fetched_docs_as_wat,
        fetched_docs_as_wet,
    )

    docs.sparkSession.dataSource.register(WarcDataSource)

    for name, project in (
        ("warc", fetched_docs_as_warc),
        ("wat", fetched_docs_as_wat),
        ("wet", fetched_docs_as_wet),
    ):
        project(docs).write.format("warc").option(
            "path", os.path.join(root, name)
        ).mode("overwrite").save()


def build_corpus(
    spark: SparkSession,
    config: CrawlConfig,
    seeds: DataFrame | None,
    out_root: str,
    pack_budget: int = 64,
    max_rounds: int | None = None,
    gopher_overrides: dict | None = None,
    shard_seq_len: int | None = None,
    dedup: str = "exact",
) -> CorpusBuildResult:
    """Run the full pipeline; returns the stage-count manifest and the
    packed-corpus path. Idempotent per ``out_root``: archives and corpus
    are written mode=overwrite, the manifest last (a crashed build leaves
    no manifest, so re-running rebuilds cleanly)."""
    engine = CrawlEngine(spark, config)
    engine.crawl(seeds=seeds, max_rounds=max_rounds)
    docs = engine.fetched_docs.read().filter(F.col("crawl_id") == config.crawl_id)
    n_fetched = docs.count()

    _archive_triple(docs, os.path.join(out_root, "archive"))

    # text layer + quality gate (projections fused into the dedup job)
    from spider_go_spark.functions.spans import assembled_col, pack_spans
    from spider_go_spark.queries.curation import gopher_flags

    text = docs.select(
        "doc_id", "content_hash", "round", "fetch_rank", "spans",
        assembled_col("spans").alias("text"),
    )
    # gopher_overrides re-tunes the published thresholds for the corpus at
    # hand (the synthetic web's pages are sentence-sized; a real crawl
    # keeps the published defaults)
    flags = gopher_flags(
        text.select("doc_id", "text"), **(gopher_overrides or {})
    ).join(text.drop("text"), "doc_id")
    rule_cols = ["r_words", "r_mwl", "r_alpha", "r_stop", "r_symbol"]
    funnel = flags.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        *[F.sum((~F.col(c)).cast("long")).alias(c) for c in rule_cols],
    ).collect()[0]
    kept = flags.filter("keep")

    # exact dedup: first fetched copy wins (min (round, fetch_rank, doc_id))
    canon = (
        kept.groupBy("content_hash")
        .agg(
            F.min(F.struct("round", "fetch_rank", "doc_id")).alias("c"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(F.col("c.doc_id").alias("doc_id"), "n_copies")
    )
    unique = kept.join(canon, "doc_id")
    n_unique = unique.count()

    # optional stage 5b: near-duplicate collapse on the exact-dedup
    # survivors — MinHash(16)+LSH(4×4) band candidates (sub-quadratic,
    # content-keyed equi-join) → fixed-point min-label connected
    # components (LSH chaining can build components of arbitrary diameter;
    # a fixed-k propagation would silently keep >1 "canonical" doc per
    # long chain) → keep one canonical doc (the min (round, fetch_rank)
    # key) per component. Candidate-based, unverified collapse: the
    # aggressive end of the near-dup dial (the gate queries carry the
    # verified variants).
    n_near_groups = None
    if dedup not in ("exact", "near"):
        raise ValueError(f"dedup must be 'exact' or 'near', got {dedup!r}")
    if dedup == "near":
        from spider_go_spark.functions import textkernel as tk
        from spider_go_spark.operators.graph import label_propagation_fixed_point

        key = (F.col("round").cast("long") * (1 << 32) + F.col("fetch_rank")).alias("key")
        ud = unique.join(text.select("doc_id", "text"), "doc_id").select(
            "doc_id", key, "text"
        )
        h = (
            ud.select("doc_id", "key", tk.shingle_hashes(F.col("text")).alias("hashes"))
            .filter(F.size("hashes") > 0)
        )
        from spider_go_spark.queries.textops import minhash_signature_df

        sig = minhash_signature_df(h, id_col="key")
        bands = (
            sig.select("key", F.explode(tk.lsh_band_signatures(F.col("sig"))).alias("b"))
            .select("key", F.col("b.band_id").alias("band_id"),
                    F.col("b.band_sig").alias("band_sig"))
            .localCheckpoint(eager=True)
        )
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.key") < F.col("b.key")),
            )
            .select(F.col("a.key").alias("src"), F.col("b.key").alias("dst"))
            .distinct()
        )
        edges = pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        nodes = h.select(F.col("key").alias("node"))
        labels = label_propagation_fixed_point(nodes, edges)
        n_near_groups = labels.select(F.countDistinct("label")).collect()[0][0]
        # canonical node of a component carries its own id as label;
        # shingle-less docs never entered the graph and all survive
        canonical = labels.filter(F.col("node") == F.col("label")).select(
            F.col("node").alias("key")
        )
        survivors = ud.join(canonical, "key").select("doc_id").unionByName(
            ud.join(h.select("key"), "key", "left_anti").select("doc_id")
        )
        unique = unique.join(survivors, "doc_id")
    n_after_near = unique.count() if dedup == "near" else None

    packed = pack_spans(unique.select("doc_id", "spans"), budget=pack_budget)
    corpus_path = os.path.join(out_root, "corpus")
    packed.write.mode("overwrite").parquet(corpus_path)
    n_samples = spark.read.parquet(corpus_path).count()

    # optional stage 7: binary token shards (the dataloader-facing layer).
    # Crawl doc_ids are strings; the numeric doc key the shard sample ids
    # need is the engine's own deterministic (round, fetch_rank) identity.
    n_shard_samples = None
    if shard_seq_len:
        from spider_go_spark.sources.tokenshards import (
            TokenShardDataSource,
            fixed_width_samples,
        )

        spark.dataSource.register(TokenShardDataSource)
        numbered = unique.join(
            text.select("doc_id", "text"), "doc_id"
        ).select(
            (F.col("round").cast("long") * (1 << 32) + F.col("fetch_rank"))
            .alias("doc_id"),
            "text",
        )
        samples = fixed_width_samples(numbered, shard_seq_len)
        shards_path = os.path.join(out_root, "shards")
        samples.select("sample_id", "tokens").write.format("tokenshards").option(
            "path", shards_path
        ).option("seq_len", str(shard_seq_len)).mode("overwrite").save()
        n_shard_samples = (
            spark.read.format("tokenshards").option("path", shards_path).load().count()
        )

    manifest = {
        "crawl_id": config.crawl_id,
        "n_fetched": n_fetched,
        "n_gated": int(funnel["n"]),
        "n_kept": int(funnel["kept"]),
        "rejects_by_rule": {c: int(funnel[c]) for c in rule_cols},
        "n_unique": int(n_unique),
        "pack_budget": pack_budget,
        "n_samples": int(n_samples),
    }
    if n_shard_samples is not None:
        manifest["shard_seq_len"] = shard_seq_len
        manifest["n_shard_samples"] = int(n_shard_samples)
    if dedup == "near":
        manifest["dedup"] = "near"
        manifest["n_near_groups"] = int(n_near_groups)
        manifest["n_after_near"] = int(n_after_near)
    tmp = os.path.join(out_root, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_root, "manifest.json"))
    return CorpusBuildResult(manifest, corpus_path)
