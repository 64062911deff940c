"""spider_go_spark — a from-scratch PySpark-native crawl/frontier engine.

Semantics-equivalent rebuild of the capabilities of ``targc/spider-go``
(reference snapshot at /root/reference, a Go workflow/DAG engine), recast as
a web-scale URL-frontier + fetch scheduler per the project's north rule:

- frontier as partitioned snapshot-versioned tables (Iceberg-style commit
  model over Parquet — :mod:`spider_go_spark.tables`),
- sharded Bloom-filter URL-seen set over canonicalized 64-bit-hashed URLs
  (:mod:`spider_go_spark.operators.seen`),
- per-host politeness scheduler: robots rules + crawl-delay budgets via
  window-ranked priority queues (:mod:`spider_go_spark.operators.politeness`),
- batched fetch-parse-enqueue rounds as DataFrame micro-iterations with
  vectorized Arrow/pandas UDFs (:mod:`spider_go_spark.plans.round_loop`),
- checkpointed round state with per-partition lineage + metrics, resumable
  bit-identically (:mod:`spider_go_spark.plans.checkpoint`).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable semantics.
"""

__version__ = "0.1.0"

from spider_go_spark.session import get_spark  # noqa: F401
