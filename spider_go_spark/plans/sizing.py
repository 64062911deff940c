"""Design-scale sizing: explicit partition/shard/Bloom parameters as a
function of frontier size (SURVEY.md §7.3 step 8; north rule: "frontier
scales to 10^10 URLs with explicit partition counts").

Nothing here guesses at runtime — the formulas make the 10^10-URL design
point a config computation, so the same code runs at test scale and at
cluster scale with parameters that keep every task within executor memory:

- shuffle/scan partitions: frontier bytes / 128 MB target split
  (``spark.sql.files.maxPartitionBytes`` default in session.py),
- Bloom shards: sized so each shard bitmap stays ≤ ``max_shard_mb`` at
  ``bits_per_item`` (10 bits ⇒ ~1% FP), so the cogrouped probe ships small
  bitmaps and the per-shard build fits comfortably in a task,
- politeness salt: ceil(hot-host share × round assignments / rows a single
  window task should sort).

Worked 10^10 example (the design point):
    >>> p = plan_sizing(10_000_000_000)
    >>> p.shuffle_partitions      # ~2 TB frontier / 128 MiB splits
    14902
    >>> p.num_shards              # 10^11 bloom bits ≤ 16 MiB/shard
    746
    >>> p.bloom_m_bits_per_shard <= 16 * 8 * 2**20
    True
"""

from __future__ import annotations

import math
from dataclasses import dataclass

FRONTIER_ROW_BYTES = 200  # url + url_norm + hashes + metadata, parquet-encoded
TARGET_SPLIT_BYTES = 128 * 2**20
DEFAULT_BITS_PER_ITEM = 10  # ~1% Bloom FP before the exact-verify join


@dataclass(frozen=True)
class Sizing:
    frontier_urls: int
    shuffle_partitions: int
    num_shards: int
    bloom_m_bits_per_shard: int
    salt_n: int


def plan_sizing(
    frontier_urls: int,
    row_bytes: int = FRONTIER_ROW_BYTES,
    bits_per_item: int = DEFAULT_BITS_PER_ITEM,
    max_shard_mb: int = 16,
    hot_host_share: float = 0.3,
    round_assignments: int | None = None,
    max_window_rows_per_task: int = 2_000_000,
) -> Sizing:
    """Compute explicit partition counts for a target frontier size."""
    frontier_bytes = frontier_urls * row_bytes
    shuffle_partitions = max(8, math.ceil(frontier_bytes / TARGET_SPLIT_BYTES))

    max_shard_bits = max_shard_mb * 8 * 2**20
    total_bloom_bits = frontier_urls * bits_per_item
    num_shards = max(8, math.ceil(total_bloom_bits / max_shard_bits))
    m_bits = math.ceil(frontier_urls / num_shards * bits_per_item / 8) * 8

    if round_assignments is None:
        round_assignments = max(1, frontier_urls // 1000)  # ~0.1% of frontier/round
    hot_rows = int(round_assignments * hot_host_share)
    salt_n = max(4, math.ceil(hot_rows / max_window_rows_per_task))

    return Sizing(
        frontier_urls=frontier_urls,
        shuffle_partitions=shuffle_partitions,
        num_shards=num_shards,
        bloom_m_bits_per_shard=m_bits,
        salt_n=salt_n,
    )
