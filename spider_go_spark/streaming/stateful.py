"""Custom stateful streaming operator: a per-host crawl-budget limiter via
``applyInPandasWithState``.

The batch engine enforces politeness per round with window ranks
(operators/politeness.py). In a continuous setting the same semantics need
per-key state that SURVIVES across micro-batches: each host carries a
lifetime fetch allowance (≙ the reference's per-worker semaphore,
/root/reference/pkg/spider/messenger_worker_nats.go:103-106, made durable),
and every incoming candidate either consumes one unit or is dropped —
exactly the kind of operator Spark has no built-in for, hence the
grouped-map-with-state escape hatch (Arrow-batched, state checkpointed with
the query).

Emission order within a batch follows the engine's strict scheduler order
(priority desc, then url_norm) so results are deterministic for a given
sequence of input batches.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CANDIDATE_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("priority", DoubleType(), False),
    ]
)

ADMITTED_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("priority", DoubleType(), False),
        StructField("admitted_rank", LongType(), False),  # lifetime rank per host
    ]
)

STATE_SCHEMA = StructType([StructField("n_admitted", LongType(), False)])


def make_budget_limiter(host_budget: int):
    """Returns the applyInPandasWithState function enforcing a lifetime
    per-host admission budget."""

    def limit(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        (n_admitted,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # scheduler order: priority desc, url_norm asc (strict total order)
        batch = batch.sort_values(
            ["priority", "url_norm"], ascending=[False, True], ignore_index=True
        ).drop_duplicates(subset=["url_norm"], ignore_index=True)
        room = max(0, host_budget - n_admitted)
        admitted = batch.iloc[:room]
        state.update((n_admitted + len(admitted),))
        if len(admitted):
            out = admitted.assign(
                admitted_rank=range(n_admitted + 1, n_admitted + 1 + len(admitted))
            )
            yield out[["host", "url_norm", "priority", "admitted_rank"]]

    return limit


def admit_stream(candidates: DataFrame, host_budget: int) -> DataFrame:
    """Streaming politeness admission: groupBy(host) + stateful budget."""
    return candidates.groupBy("host").applyInPandasWithState(
        make_budget_limiter(host_budget),
        outputStructType=ADMITTED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
