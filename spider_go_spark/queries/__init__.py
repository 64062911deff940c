"""Query catalog: the engine's operator surface as (spark, sf_dir) -> DataFrame
callables, each paired with an ANSI-SQL oracle string (DuckDB dialect kept to
the common subset) for the driver's correctness gate.

Three families:
- :mod:`relational` — SURVEY.md §2 operator analogues (joins, windows, aggs,
  set ops, pagination, branch routing, expression mapping) over the driver's
  TPC-H-ish testdata tables;
- :mod:`textops` — training-data pipeline text operators (dedup exact /
  MinHash-LSH / SimHash / n-gram Jaccard, quality scoring, language ID,
  fingerprinting, token counting) over ``documents``;
- :mod:`vectorops` — similarity search over ``embeddings`` (brute-force
  cosine top-k, LSH-bucketed ANN);
- :mod:`temporal` — as-of and bounded range joins over ``events``
  (single-shuffle linear plans; DuckDB native ASOF JOIN as the oracle);
- :mod:`pipelineops` — train/val/test hash splits, weighted corpus mixing,
  benchmark contamination checks, sequence packing, and fixed-point-integer
  PageRank (bit-exact vs an unrolled-CTE SQL oracle);
- :mod:`sketchops` — HyperLogLog distinct counting, Count-Min heavy
  hitters, TF-IDF term ranking, Gopher-style repetition quality, and
  deterministic stratified sampling (all-integer sketch arithmetic on the
  shared multiplicative-hash family, bit-exact cross-engine).

Column-name parity contract: every computed column is aliased identically in
the DataFrame code and the oracle SQL (the driver hashes values under sorted
column names).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
