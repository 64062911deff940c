"""Sharded Bloom-filter URL-seen set with exact-verify anti-join.

Semantics target: EXACT membership, matching the reference's dedup-by-
unique-index (Mongo composite unique indexes,
/root/reference/pkg/spider/storage_workflow_mongodb.go:81-119). The
reference also has an approximate 2-minute dedup window (NATS ``Duplicates``,
nats.go:161); here the Bloom shards play that "fast approximate" role, but
false positives are always resolved by an exact anti-join against the
``seen_urls`` table — so the composed operator is exact.

Scale design (10^10 URLs):
- ``seen_shards``: S shards of numpy bitmaps, shard_id = pmod(url_hash, S).
  At 10 bits/URL and S=8192, each shard bitmap is ~1.5 MB — streams through
  ``cogroup().applyInPandas`` without memory pressure; the probe shuffles
  candidates once on shard_id and ships each bitmap exactly once per task.
- ``seen_urls``: exact membership, stored as a shard_id-BUCKETED snapshot
  table (round_loop commits it via ``append_buckets``), and the verify
  join takes a ``read_buckets`` callable so the scan physically prunes to
  only the shards that produced Bloom positives. The verify join input is
  only (FP_rate × candidates + true duplicates) rows against those shards'
  files — the Bloom pre-filter plus shard pruning is what makes exact
  dedup affordable at 10^10 (an anti-join can never broadcast its right
  side, so without pruning every round would shuffle the whole table).
- Probe-side skew: candidates are hashed uniformly by url_hash, so shard
  load is balanced regardless of host skew.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_go_spark.functions.urls import bloom_hashes
from spider_go_spark.schemas import SEEN_SHARDS

DEFAULT_BITS_PER_ITEM = 10  # ~1% false positives
DEFAULT_K = 7


def bloom_params(expected_items: int, num_shards: int, bits_per_item: int = DEFAULT_BITS_PER_ITEM):
    """Per-shard (m_bits, k). m_bits rounded up to a whole number of bytes."""
    per_shard = max(1, expected_items // max(1, num_shards))
    m_bits = int(math.ceil(per_shard * bits_per_item / 8.0)) * 8
    return m_bits, DEFAULT_K


def shard_id_col(url_hash_col="url_hash", num_shards: int = 64):
    c = F.col(url_hash_col) if isinstance(url_hash_col, str) else url_hash_col
    return F.pmod(c, F.lit(num_shards)).cast("int")


def build_shard_updates(
    new_urls: DataFrame, num_shards: int, m_bits: int, k: int
) -> DataFrame:
    """Bloom bitmaps for a batch of new URLs (url_norm, url_hash) → one row
    per touched shard, conforming to SEEN_SHARDS. Pure map-side grouping on
    shard_id; each task builds its shard's bitmap in numpy."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        idx = bloom_hashes(pdf["url_norm"].to_numpy(), m_bits, k).ravel()
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bloom_bits": [bits.tobytes()],
                "n_items": [len(pdf)],
                "m_bits": [m_bits],
                "k_hashes": [k],
            }
        )

    cands = new_urls.select("url_norm", shard_id_col("url_hash", num_shards).alias("shard_id"))
    return cands.groupBy("shard_id").applyInPandas(build, SEEN_SHARDS)


def merge_shards(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """OR together bitmaps per shard_id (existing ∪ updates)."""

    def or_bitmaps(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bloom_bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bloom_bits"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bloom_bits": [acc.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
                "m_bits": [int(pdf["m_bits"].iloc[0])],
                "k_hashes": [int(pdf["k_hashes"].iloc[0])],
            }
        )

    both = existing.unionByName(updates)
    return both.groupBy("shard_id").applyInPandas(or_bitmaps, SEEN_SHARDS)


def bloom_maybe_seen(candidates: DataFrame, shards: DataFrame, num_shards: int) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via a cogrouped per-shard probe.

    ``candidates`` must carry url_norm + url_hash. The cogroup ships each
    shard bitmap once per task (never once per row) and probes the whole
    candidate group with vectorized numpy bit tests.
    """
    from pyspark.sql import types as T

    cands = candidates.withColumn("shard_id", shard_id_col("url_hash", num_shards))
    # copy the fields — StructType.add on df.schema mutates the df's cache
    out_schema = T.StructType(
        list(cands.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        if len(shard_pdf) == 0:
            return cand_pdf.assign(maybe_seen=False)
        bits = np.frombuffer(shard_pdf["bloom_bits"].iloc[0], dtype=np.uint8)
        m_bits = int(shard_pdf["m_bits"].iloc[0])
        k = int(shard_pdf["k_hashes"].iloc[0])
        idx = bloom_hashes(cand_pdf["url_norm"].to_numpy(), m_bits, k)
        hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return cand_pdf.assign(maybe_seen=hit.all(axis=1))

    return (
        cands.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(probe, out_schema)
    )


def bloom_maybe_seen_broadcast(
    candidates: DataFrame,
    shard_rows: list,
    num_shards: int,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Map-side Bloom probe: every shard bitmap rides a broadcast variable
    and candidates are tagged IN PLACE by a scalar pandas UDF — zero
    shuffle, zero cogroup (the north-star's "broadcast for small shards"
    arm). Only valid when the whole bitmap array fits a broadcast
    (``filter_unseen`` gates on size); at the 10^10 design point (~12.5 GB
    of bitmaps) the cogrouped shard-shuffle path takes over.

    ``shard_rows``: collected (shard_id, bloom_bits) rows; missing shards
    probe as all-zeros (nothing seen), matching the cogroup's empty-group
    semantics."""
    sc = candidates.sparkSession.sparkContext
    all_bits = np.zeros((num_shards, m_bits // 8), dtype=np.uint8)
    for r in shard_rows:
        all_bits[int(r["shard_id"])] = np.frombuffer(r["bloom_bits"], dtype=np.uint8)
    bc = sc.broadcast(all_bits)

    @F.pandas_udf("boolean")
    def probe(url_norm: pd.Series, shard_id: pd.Series) -> pd.Series:
        bits = bc.value
        idx = bloom_hashes(url_norm.to_numpy(), m_bits, k)
        sid = shard_id.to_numpy()
        hit = (bits[sid[:, None], idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    tagged = candidates.withColumn("shard_id", shard_id_col("url_hash", num_shards))
    return tagged.withColumn("maybe_seen", probe(F.col("url_norm"), F.col("shard_id")))


# a 512 MB bitmap array broadcasts in seconds on a cluster and probes from
# executor memory; beyond it (≳ 4×10^8 URLs at 10 bits each) the sharded
# cogroup is the scale path
BROADCAST_BITMAP_CAP_BYTES = 512 << 20


def filter_unseen(
    candidates: DataFrame,
    shards: DataFrame,
    seen_urls,
    num_shards: int,
    m_bits: int | None = None,
    k_hashes: int | None = None,
    broadcast_cap_bytes: int = BROADCAST_BITMAP_CAP_BYTES,
) -> DataFrame:
    """Exact not-seen filter: Bloom pre-filter + exact anti-join for the
    Bloom positives. Returns candidates (original columns + shard_id)
    guaranteed not in ``seen_urls``.

    Two probe strategies, chosen by total bitmap size (≙ the broadcast-vs-
    sort-merge join decision the north star prescribes for the seen-set
    probe):

    - **broadcast** (callers pass ``m_bits``/``k_hashes`` and the bitmaps
      fit ``broadcast_cap_bytes``): candidates are tagged in place by a
      pandas UDF reading broadcast bitmaps — the probe adds NO shuffle and
      no extra materialization; both consumers re-run the cheap numpy probe
      over the caller's cached candidates.
    - **cogroup** (bitmaps too big, or geometry unknown): candidates
      shuffle once on shard_id and meet their shard bitmap in a cogrouped
      pandas probe; the tagged set is persisted so the two branches don't
      re-run the shuffle.

    Either way the exact verify left-anti-joins Bloom positives against
    ``seen_urls`` on (shard_id, url_norm).

    ``seen_urls`` may be:

    - a DataFrame — the verify joins against it as given (the scan reads
      whatever the caller's plan reads); or
    - a CALLABLE ``read_seen(shard_ids) -> DataFrame`` — the positives'
      distinct shard ids are collected first (≤ num_shards ints, off the
      already-tagged candidates) and the callable returns only those
      shards' rows (e.g. ``SnapshotTable.read_buckets`` over a
      shard-bucketed seen table). This is the 10^10-scale arm: in a LEFT
      ANTI join only the right side could broadcast, and that side is the
      seen table itself (~1 TB at design point) — so WITHOUT physical
      pruning every round pays a full shuffle of the whole seen set to
      verify ~FP_rate×round_size positives. With shard pruning the scan
      is bounded by the positives' shard subset, and AQE broadcasts the
      tiny maybe-side... which it cannot: anti-join build side is the
      seen side, so the win is the pruned scan + a shuffle proportional
      to the POSITIVE shards only, not the whole table.

    The result is returned persisted+materialized; the CALLER must
    unpersist it (the cogroup arm's intermediate cache is released here).
    """
    use_broadcast = (
        m_bits is not None
        and k_hashes is not None
        and num_shards * (m_bits // 8) <= broadcast_cap_bytes
    )
    tagged_cached = None
    if use_broadcast:
        shard_rows = shards.select("shard_id", "bloom_bits").collect()
        tagged = bloom_maybe_seen_broadcast(
            candidates, shard_rows, num_shards, m_bits, k_hashes
        )
    else:
        tagged = tagged_cached = bloom_maybe_seen(candidates, shards, num_shards).persist()
    return exact_verify_unseen(tagged, seen_urls, tagged_cached)


def exact_verify_unseen(tagged: DataFrame, seen_urls, tagged_cached=None) -> DataFrame:
    """The filter-agnostic exact half of the seen probe (shared by the
    Bloom and cuckoo arms): split on ``maybe_seen``, anti-join the
    positives against the (shard-pruned) exact table, union back.
    Returns persisted+materialized; unpersists ``tagged_cached``."""
    definite_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    if callable(seen_urls):
        pos_shards = sorted(
            r["shard_id"] for r in maybe.select("shard_id").distinct().collect()
        )
        seen_df = seen_urls(pos_shards)
    else:
        seen_df = seen_urls
    verified_new = maybe.join(
        seen_df.select("shard_id", "url_norm"), ["shard_id", "url_norm"], "left_anti"
    )
    result = definite_new.unionByName(verified_new).persist()
    result.count()
    if tagged_cached is not None:
        tagged_cached.unpersist()
    return result
