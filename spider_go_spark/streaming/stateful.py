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


# --------------------------------------------------------------------------
# Decayed per-host rate throttle: the online "sustained fetch rate" limiter
# (vs the lifetime cap above). State is an exponentially-decayed admission
# counter in integer micro-units keyed by event-time round — no wall clock,
# so a replay (or a restart from checkpoint) reproduces decisions exactly.
# --------------------------------------------------------------------------

THROTTLE_SCALE = 1_000_000

RATE_CANDIDATE_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("round", LongType(), False),
    ]
)

RATE_ADMITTED_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("round", LongType(), False),
        StructField("rate_u", LongType(), False),  # post-admit decayed rate
    ]
)

RATE_STATE_SCHEMA = StructType(
    [
        StructField("last_round", LongType(), False),
        StructField("rate_u", LongType(), False),
    ]
)


def make_rate_throttle(rate_cap_u: int, decay_ppm: int):
    """applyInPandasWithState function for a decayed admission rate: between
    rounds the counter decays by ``decay_ppm/SCALE`` per round step
    (integer multiply-divide — deterministic), each admission adds one
    SCALE unit, and a candidate is admitted iff the decayed counter is
    below ``rate_cap_u``. A host that bursts gets throttled; one that goes
    quiet earns its rate back — the classic token-bucket-with-leak shape,
    in event-time rounds rather than wall clock.

    The per-host fold is inherently sequential (each admission feeds the
    next decision), so rows are processed in strict (round, url_norm) order
    with a Python loop INSIDE the Arrow batch — hosts are the parallel
    unit (10^7 of them at web scale), not rows within a host. Decisions
    are batch-boundary independent as long as each host's rounds arrive in
    order (asserted by the one-batch ≡ two-batch test)."""

    def throttle(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last_round, rate_u = state.get if state.exists else (-1, 0)
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["round", "url_norm"], ignore_index=True
        )
        out = []
        for r in batch.itertuples(index=False):
            rnd = int(r.round)
            if last_round >= 0 and rnd > last_round:
                for _ in range(rnd - last_round):
                    rate_u = rate_u * decay_ppm // THROTTLE_SCALE
            last_round = max(last_round, rnd)
            if rate_u < rate_cap_u:
                rate_u += THROTTLE_SCALE
                out.append((host, r.url_norm, rnd, rate_u))
        state.update((last_round, rate_u))
        if out:
            yield pd.DataFrame(out, columns=["host", "url_norm", "round", "rate_u"])

    return throttle


def throttle_stream(candidates: DataFrame, rate_cap_u: int, decay_ppm: int) -> DataFrame:
    """Streaming decayed-rate admission: groupBy(host) + stateful decay."""
    return candidates.groupBy("host").applyInPandasWithState(
        make_rate_throttle(rate_cap_u, decay_ppm),
        outputStructType=RATE_ADMITTED_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
