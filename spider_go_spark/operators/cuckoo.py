"""Sharded cuckoo-filter URL-seen set — the DELETABLE twin of
``operators/seen.py`` (the north rule names a "Bloom/cuckoo-filter
URL-seen set"; `CrawlConfig.seen_filter` picks the arm).

Why a second filter: a Bloom bitmap cannot un-set a bit, so retracting a
URL from the seen set (takedown / robots-removal compliance — the
``CrawlEngine.forget_urls`` admin op) forces a full rebuild of the
affected shards from the exact table. A cuckoo filter stores b=4 slots of
16-bit fingerprints per bucket and supports O(1) per-item deletion, so a
forget only touches the fingerprints being removed. Same composed-exact
contract as the Bloom arm: the filter is a fast approximate pre-filter
and every positive is resolved by the exact anti-join against the
shard-bucketed ``seen_urls`` table — false positives cost work, never
correctness, and the filter NEVER false-negatives for inserted items
(evictions that exceed MAX_KICKS land in a per-shard stash, they are not
dropped).

Reference parity: same dedup-by-unique-index semantics as the Bloom arm
(/root/reference/pkg/spider/storage_workflow_mongodb.go:81-119).

Scale design (10^10 URLs): identical sharding to seen.py — shard_id =
pmod(url_hash, S); each shard's table is (n_buckets × 4) uint16 ≈
2.5 bytes/URL at 0.8 load (vs 1.25 B/URL for the 10-bit Bloom, bought
back by a ~80× lower FP rate: 2b/2^16 ≈ 0.012% vs ~1%, so the exact
verify reads far fewer shards per round). Probe is one shuffle on
shard_id (cogroup) or zero shuffles (broadcast) exactly like seen.py.

Determinism: insertion order changes the table LAYOUT (not membership),
so every batch is sorted by url_norm before insert — rebuilding the same
set always yields the same bytes, keeping committed snapshots
reproducible.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4
MAX_KICKS = 500
_FP_MULT = np.uint64(0x5BD1E995)  # odd multiplier for the partial-key alt bucket

CUCKOO_SHARDS = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("table_bits", T.BinaryType(), False),
        T.StructField("stash", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("n_buckets", T.IntegerType(), False),
    ]
)


def cuckoo_params(expected_items: int, num_shards: int) -> int:
    """Per-shard bucket count: a power of two sized for ≤0.8 load at the
    expected volume (b=4 cuckoo tables fill reliably to ~0.95; the
    headroom keeps kick chains short and the stash empty)."""
    per_shard = max(1, expected_items // max(1, num_shards))
    need = max(1, int(math.ceil(per_shard / (SLOTS * 0.8))))
    return 1 << max(1, (need - 1).bit_length())


def fp_index(url_norms, n_buckets: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp uint16 nonzero, i1, i2) for each url. i2 = i1 XOR alt(fp) with
    power-of-two n_buckets, so the pairing is an involution (either bucket
    recovers the other from the stored fingerprint alone)."""
    vals = np.asarray(url_norms, dtype=object)
    mask = np.uint64(n_buckets - 1)
    h1 = pd.util.hash_array(vals, hash_key="sgs-cuckoo-fp-00")  # 16-byte keys
    h2 = pd.util.hash_array(vals, hash_key="sgs-cuckoo-ix-00")
    fp = (h1 % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    i1 = (h2 & mask).astype(np.int64)
    i2 = (i1 ^ (fp.astype(np.uint64) * _FP_MULT & mask).astype(np.int64))
    return fp, i1, i2.astype(np.int64)


def _alt(i: int, fp: int, mask: int) -> int:
    return int(i) ^ int(np.uint64(fp) * _FP_MULT & np.uint64(mask))


def new_table(n_buckets: int) -> np.ndarray:
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def insert_batch(
    table: np.ndarray, stash: list[tuple[int, int]], fps, i1s, i2s
) -> None:
    """Insert (fp, i1, i2) triples; items that exhaust MAX_KICKS go to the
    stash (never dropped — a false negative would let a seen URL refetch).
    Duplicate fingerprints are stored as copies, which is what makes
    per-item deletion sound."""
    mask = table.shape[0] - 1
    for fp, i1, i2 in zip(fps, i1s, i2s):
        fp, i1, i2 = int(fp), int(i1), int(i2)
        placed = False
        for i in (i1, i2):
            empty = np.nonzero(table[i] == 0)[0]
            if empty.size:
                table[i, empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_fp, cur_i = fp, i1
        for kick in range(MAX_KICKS):
            slot = (cur_fp + kick) % SLOTS  # deterministic eviction choice
            cur_fp, table[cur_i, slot] = int(table[cur_i, slot]), cur_fp
            cur_i = _alt(cur_i, cur_fp, mask)
            empty = np.nonzero(table[cur_i] == 0)[0]
            if empty.size:
                table[cur_i, empty[0]] = cur_fp
                placed = True
                break
        if not placed:
            stash.append((cur_i, cur_fp))


def lookup_batch(
    table: np.ndarray, stash: np.ndarray, fps, i1s, i2s
) -> np.ndarray:
    """Vectorized membership: fp present in bucket i1 or i2 (two gathers),
    plus the (tiny, normally empty) stash."""
    fps = np.asarray(fps, dtype=np.uint16)
    hit = (table[i1s] == fps[:, None]).any(axis=1) | (
        table[i2s] == fps[:, None]
    ).any(axis=1)
    mask = table.shape[0] - 1
    for si, sfp in stash.reshape(-1, 2):
        at = np.asarray(
            [_alt(int(si), int(sfp), mask)], dtype=np.int64
        )  # stash records ONE resting bucket; match items whose pair covers it
        hit |= (fps == np.uint16(sfp)) & ((i1s == int(si)) | (i2s == int(si)) | (i1s == at[0]) | (i2s == at[0]))
    return hit


def delete_batch(
    table: np.ndarray, stash: list[tuple[int, int]], fps, i1s, i2s
) -> int:
    """Remove ONE copy of each (fp, i1/i2); returns how many were found.
    Only items previously inserted may be deleted (cuckoo-filter
    contract); the engine guarantees this by deleting exactly the rows it
    removes from the exact seen_urls table."""
    removed = 0
    for fp, i1, i2 in zip(fps, i1s, i2s):
        fp, i1, i2 = int(fp), int(i1), int(i2)
        done = False
        for i in (i1, i2):
            slots = np.nonzero(table[i] == fp)[0]
            if slots.size:
                table[i, slots[0]] = 0
                removed += 1
                done = True
                break
        if done:
            continue
        for idx, (si, sfp) in enumerate(stash):
            if sfp == fp and si in (i1, i2):
                stash.pop(idx)
                removed += 1
                break
    return removed


def _pack_stash(stash: list[tuple[int, int]]) -> bytes:
    return np.asarray(stash, dtype=np.int64).tobytes()


def _unpack_stash(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype=np.int64) if raw else np.empty(0, dtype=np.int64)


def _shard_row(shard_id: int, table: np.ndarray, stash, n_items: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "shard_id": [shard_id],
            "table_bits": [table.tobytes()],
            "stash": [_pack_stash(list(stash))],
            "n_items": [n_items],
            "n_buckets": [table.shape[0]],
        }
    )


def _load(pdf_row) -> tuple[np.ndarray, list[tuple[int, int]]]:
    nb = int(pdf_row["n_buckets"])
    table = (
        np.frombuffer(pdf_row["table_bits"], dtype=np.uint16)
        .reshape(nb, SLOTS)
        .copy()
    )
    st = _unpack_stash(pdf_row["stash"]).reshape(-1, 2)
    return table, [tuple(map(int, r)) for r in st]


def build_cuckoo_updates(
    new_urls: DataFrame, num_shards: int, n_buckets: int
) -> DataFrame:
    """Per-shard cuckoo tables for a batch of new (url_norm, url_hash)
    rows — the cuckoo twin of seen.build_shard_updates. Map-side grouping
    on shard_id; batch sorted by url_norm so the table bytes are a pure
    function of the SET."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        urls = np.sort(pdf["url_norm"].to_numpy())
        table = new_table(n_buckets)
        stash: list[tuple[int, int]] = []
        fp, i1, i2 = fp_index(urls, n_buckets)
        insert_batch(table, stash, fp, i1, i2)
        return _shard_row(int(pdf["shard_id"].iloc[0]), table, stash, len(urls))

    from spider_go_spark.operators.seen import shard_id_col

    cands = new_urls.select(
        "url_norm", shard_id_col("url_hash", num_shards).alias("shard_id")
    )
    return cands.groupBy("shard_id").applyInPandas(build, CUCKOO_SHARDS)


def merge_cuckoo(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """Union per-shard tables: the largest row is the base; every other
    row's occupied slots (bucket order, then slot order — deterministic)
    and stash entries re-insert into it. Each slot's bucket index is one
    of its item's two buckets, so re-inserting at that index is sound."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("n_items", ascending=False).reset_index(drop=True)
        table, stash = _load(pdf.iloc[0])
        mask = table.shape[0] - 1
        total = int(pdf["n_items"].sum())
        for j in range(1, len(pdf)):
            other, other_stash = _load(pdf.iloc[j])
            bi, si = np.nonzero(other)
            fps = other[bi, si].astype(np.uint16)
            i1 = bi.astype(np.int64)
            i2 = np.asarray(
                [_alt(int(b), int(f), mask) for b, f in zip(bi, fps)], dtype=np.int64
            )
            insert_batch(table, stash, fps, i1, i2)
            for sb, sfp in other_stash:
                insert_batch(
                    table, stash,
                    np.asarray([sfp], dtype=np.uint16),
                    np.asarray([sb], dtype=np.int64),
                    np.asarray([_alt(sb, sfp, mask)], dtype=np.int64),
                )
        return _shard_row(int(pdf["shard_id"].iloc[0]), table, stash, total)

    both = existing.unionByName(updates)
    return both.groupBy("shard_id").applyInPandas(merge, CUCKOO_SHARDS)


def delete_cuckoo(shards: DataFrame, victims: DataFrame, num_shards: int) -> DataFrame:
    """Remove the victim urls' fingerprints from their shards (cogrouped;
    only shards with victims are rewritten — pass-through otherwise). The
    O(1)-per-item retraction Bloom cannot do."""
    from spider_go_spark.operators.seen import shard_id_col

    vic = victims.select(
        "url_norm", shard_id_col("url_hash", num_shards).alias("shard_id")
    )

    def drop(shard_pdf: pd.DataFrame, vic_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shard_pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SHARDS.fields])
        if len(vic_pdf) == 0:
            return shard_pdf
        table, stash = _load(shard_pdf.iloc[0])
        urls = np.sort(vic_pdf["url_norm"].to_numpy())
        fp, i1, i2 = fp_index(urls, table.shape[0])
        delete_batch(table, stash, fp, i1, i2)
        return _shard_row(
            int(shard_pdf["shard_id"].iloc[0]), table, stash,
            max(0, int(shard_pdf["n_items"].iloc[0]) - len(urls)),
        )

    return (
        shards.groupBy("shard_id")
        .cogroup(vic.groupBy("shard_id"))
        .applyInPandas(drop, CUCKOO_SHARDS)
    )


def cuckoo_maybe_seen(
    candidates: DataFrame, shards: DataFrame, num_shards: int
) -> DataFrame:
    """Cogrouped per-shard probe (the big-table arm) — twin of
    seen.bloom_maybe_seen: the shard table ships once per task, the whole
    candidate group probes with two vectorized gathers."""
    from spider_go_spark.operators.seen import shard_id_col

    cands = candidates.withColumn("shard_id", shard_id_col("url_hash", num_shards))
    out_schema = T.StructType(
        list(cands.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        if len(shard_pdf) == 0:
            return cand_pdf.assign(maybe_seen=False)
        table, stash = _load(shard_pdf.iloc[0])
        fp, i1, i2 = fp_index(cand_pdf["url_norm"].to_numpy(), table.shape[0])
        hit = lookup_batch(
            table, np.asarray([x for s in stash for x in s], dtype=np.int64), fp, i1, i2
        )
        return cand_pdf.assign(maybe_seen=hit)

    return (
        cands.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(probe, out_schema)
    )


def cuckoo_maybe_seen_broadcast(
    candidates: DataFrame, shard_rows: list, num_shards: int, n_buckets: int
) -> DataFrame:
    """Map-side probe off a broadcast of every shard table — zero shuffle
    (twin of seen.bloom_maybe_seen_broadcast; same size gate applies)."""
    from spider_go_spark.operators.seen import shard_id_col

    sc = candidates.sparkSession.sparkContext
    all_tables = np.zeros((num_shards, n_buckets, SLOTS), dtype=np.uint16)
    stashes: dict[int, np.ndarray] = {}
    for r in shard_rows:
        sid = int(r["shard_id"])
        all_tables[sid] = np.frombuffer(r["table_bits"], dtype=np.uint16).reshape(
            n_buckets, SLOTS
        )
        st = _unpack_stash(r["stash"])
        if st.size:
            stashes[sid] = st
    bc = sc.broadcast((all_tables, stashes))

    @F.pandas_udf("boolean")
    def probe(url_norm: pd.Series, shard_id: pd.Series) -> pd.Series:
        tables, stash_map = bc.value
        fp, i1, i2 = fp_index(url_norm.to_numpy(), tables.shape[1])
        sid = shard_id.to_numpy()
        hit = (tables[sid[:, None], i1[:, None], :] == fp[:, None, None]).any(
            axis=(1, 2)
        ) | (tables[sid[:, None], i2[:, None], :] == fp[:, None, None]).any(axis=(1, 2))
        if stash_map:
            mask = tables.shape[1] - 1
            for s, st in stash_map.items():
                in_shard = sid == s
                if not in_shard.any():
                    continue
                for si, sfp in st.reshape(-1, 2):
                    alt = _alt(int(si), int(sfp), mask)
                    hit |= in_shard & (fp == np.uint16(sfp)) & (
                        (i1 == int(si)) | (i2 == int(si)) | (i1 == alt) | (i2 == alt)
                    )
        return pd.Series(hit)

    from spider_go_spark.operators.seen import shard_id_col as _sc

    tagged = candidates.withColumn("shard_id", _sc("url_hash", num_shards))
    return tagged.withColumn("maybe_seen", probe(F.col("url_norm"), F.col("shard_id")))


def filter_unseen_cuckoo(
    candidates: DataFrame,
    shards: DataFrame,
    seen_urls,
    num_shards: int,
    n_buckets: int,
    broadcast_cap_bytes: int | None = None,
) -> DataFrame:
    """Exact not-seen filter over the cuckoo shards: approximate probe
    (broadcast or cogroup by total table size, same policy as the Bloom
    arm) + the shared exact-verify anti-join from seen.exact_verify_unseen.
    Returns persisted+materialized; caller unpersists."""
    from spider_go_spark.operators.seen import (
        BROADCAST_BITMAP_CAP_BYTES,
        exact_verify_unseen,
    )

    cap = BROADCAST_BITMAP_CAP_BYTES if broadcast_cap_bytes is None else broadcast_cap_bytes
    total_bytes = num_shards * n_buckets * SLOTS * 2
    tagged_cached = None
    if total_bytes <= cap:
        shard_rows = shards.select("shard_id", "table_bits", "stash").collect()
        tagged = cuckoo_maybe_seen_broadcast(candidates, shard_rows, num_shards, n_buckets)
    else:
        tagged = tagged_cached = cuckoo_maybe_seen(candidates, shards, num_shards).persist()
    return exact_verify_unseen(tagged, seen_urls, tagged_cached)
