"""Per-host politeness scheduler: window-ranked priority queues with budgets.

Reference semantics being reproduced (SURVEY.md §2.6):
- NATS FIFO delivery order (/root/reference/pkg/spider/nats.go:196
  ``DeliverAllPolicy``) + fan-out in dependency order (workflow.go:140)
  → here an EXPLICIT strict total order over frontier entries:
  ``(-priority, discovered_round, discovery_rank, url_norm)``
  (priority desc, then FIFO discovery order, then canonical URL as the
  unique tiebreaker — Spark guarantees no implicit order).
- Per-worker semaphore of 10 concurrent handlers
  (messenger_worker_nats.go:103-106) → per-host per-round budget
  ``max_in_flight`` enforced by a window-ranked cut.
- ``Disabled`` action check drops messages (workflow.go:100-102) →
  disabled-host filter + robots.txt disallow filter.
- crawl_delay: a host with crawl_delay_ms d in a round of budget_ms B may
  fetch at most max(1, B // d) URLs; each assignment carries its scheduled
  offset (rank-1)*d within the round.

Skew: one hot host (≥30% of the frontier) would saturate a single window
partition. The budget cut is two-phase: rank within (host, salt) and keep
the top ``budget`` per salt (bounded output: salt_n × budget per host),
then rank within host among those survivors and keep the top ``budget``.
Phase 1 parallelizes the hot host across salt_n tasks; phase 2's groups are
provably ≤ salt_n × budget rows, so no task ever sees the whole hot host.
The result is identical to an unsalted single-phase cut because any row in
the true per-host top-``budget`` is also in the top-``budget`` of its salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spider_go_spark.functions.robots import make_robots_decision_udf
from spider_go_spark.functions.urls import path_of_series  # noqa: F401 (oracle parity)

DEFAULT_BUDGET = 10  # ≙ worker semaphore (messenger_worker_nats.go:103)
DEFAULT_ROUND_BUDGET_MS = 10_000
DEFAULT_SALT_N = 16


def frontier_order() -> list[Column]:
    """THE strict total order of the scheduler (also used by the oracle)."""
    return [
        F.col("priority").desc(),
        F.col("discovered_round").asc(),
        F.col("discovery_rank").asc(),
        F.col("url_norm").asc(),
    ]


def apply_policy(
    frontier: DataFrame,
    host_policy: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    policy_empty: bool | None = None,
    agent: str = "*",
) -> DataFrame:
    """Broadcast-join per-host policy onto the frontier and apply the
    disabled + robots filters. Missing hosts get permissive defaults.
    ``agent`` is the crawler's product token for RFC 9309 robots
    user-agent group selection ("*" = only the wildcard groups apply).

    With a non-empty policy the frontier is spread round-robin across all
    cores first: URL rows are tiny, so a bytes-based input split (128 MB)
    would run the robots UDF on a handful of tasks; round-robin is
    skew-immune (never keyed by host). The empty-policy fast path skips the
    repartition too — there is no per-row work before budget_cut's own
    window shuffle, so a shuffle here would be pure waste.

    ``policy_empty``: the emptiness of the policy plan, if the caller
    already knows it (CrawlEngine memoizes it once — the policy DataFrame
    is fixed at engine construction, so running an ``isEmpty()`` job per
    round would recompute the same answer every round).
    """
    if policy_empty is None:
        policy_empty = host_policy.isEmpty()
    if policy_empty:
        # permissive fast path: no policies ⇒ no join, no robots UDF pass
        # over the full frontier (the robots stage is the only Python in
        # scheduling — skipping it when provably a no-op saves an Arrow
        # round-trip of the whole frontier every round)
        return (
            frontier.withColumn("crawl_delay_ms", F.lit(0).cast("long"))
            .withColumn("max_in_flight", F.lit(default_budget).cast("int"))
            .withColumn("robots_txt", F.lit(None).cast("string"))
            .withColumn("disabled", F.lit(False))
            .withColumn("revisit_after_rounds", F.lit(None).cast("int"))
        )
    par = frontier.sparkSession.sparkContext.defaultParallelism
    frontier = frontier.repartition(par)
    if "revisit_after_rounds" not in host_policy.columns:  # pre-revisit policies
        host_policy = host_policy.withColumn(
            "revisit_after_rounds", F.lit(None).cast("int")
        )
    policy = host_policy.select(
        "host", "crawl_delay_ms", "max_in_flight", "robots_txt", "disabled",
        "revisit_after_rounds",
    )
    joined = frontier.join(F.broadcast(policy), "host", "left")
    joined = joined.fillna(
        {"crawl_delay_ms": 0, "max_in_flight": default_budget, "disabled": False}
    )
    joined = joined.filter(~F.col("disabled"))
    path = F.regexp_replace("url_norm", r"^[a-z0-9+.-]+://[^/?#]*", "")
    joined = joined.withColumn("__path", F.when(path == "", "/").otherwise(path))
    # ONE Arrow pass yields both the allow verdict and the group's
    # Crawl-delay; the effective per-host delay is the stricter of the
    # policy's delay and the robots directive (north rule: "robots.txt
    # rules and crawl-delay budgets").
    decision = make_robots_decision_udf(agent)
    joined = joined.withColumn(
        "__rd", decision(F.col("robots_txt"), F.col("__path"))
    )
    joined = (
        joined.filter(F.col("__rd.allowed"))
        .withColumn(
            "crawl_delay_ms",
            F.greatest(F.col("crawl_delay_ms"), F.col("__rd.delay_ms")),
        )
        .drop("__rd", "__path")
    )
    return joined


def budget_cut(
    frontier_with_policy: DataFrame,
    round_budget_ms: int = DEFAULT_ROUND_BUDGET_MS,
    salt_n: int = DEFAULT_SALT_N,
) -> DataFrame:
    """Keep the per-host top-``effective_budget`` rows under the scheduler
    order; attach ``host_rank`` and ``scheduled_offset_ms``."""
    eff_budget = F.when(
        F.col("crawl_delay_ms") > 0,
        F.least(
            F.col("max_in_flight"),
            F.greatest(F.lit(1), (F.lit(round_budget_ms) / F.col("crawl_delay_ms")).cast("int")),
        ),
    ).otherwise(F.col("max_in_flight"))
    df = frontier_with_policy.withColumn("__budget", eff_budget)

    order = frontier_order()
    # phase 1: salted pre-cut — bounds every phase-2 group to salt_n × budget
    df = df.withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(salt_n)))
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    df = df.withColumn("__rk1", F.row_number().over(w1)).filter(F.col("__rk1") <= F.col("__budget")).drop("__salt")
    # phase 2: exact per-host rank among survivors
    w2 = Window.partitionBy("host").orderBy(*order)
    df = df.withColumn("host_rank", F.row_number().over(w2)).filter(
        F.col("host_rank") <= F.col("__budget")
    )
    df = df.withColumn(
        "scheduled_offset_ms", (F.col("host_rank") - 1) * F.col("crawl_delay_ms")
    )
    return df.drop("__rk1", "__budget")


def tier_split(
    frontier: DataFrame, hot_per_host: int, salt_n: int = DEFAULT_SALT_N
) -> DataFrame:
    """Split the frontier into scheduling tiers: per host, the top
    ``hot_per_host`` rows under the scheduler order get ``__tier`` = 0
    (hot), everything else ``__tier`` = 1 (cold).

    This is what makes per-round scheduling O(round), not O(frontier):
    between rebalances the scheduler scans ONLY the hot tier, and the cut
    is provably identical to a full-frontier cut — every cold row of a
    host ranks below ``hot_per_host`` hot rows of that host, so with
    ``hot_per_host`` = R × max_budget the per-host top-budget can't reach
    into the cold tier for R consecutive rounds (each round consumes at
    most max_budget of the guard prefix), and NEW rows may enter the hot
    tier freely: a new row only makes a round's cut by outranking guard
    rows, which already outrank every cold row, so the cut stays exact.

    Same salted two-phase shape as :func:`budget_cut` (and the same
    correctness argument: a row in the true per-host top-H is in the
    top-H of its salt), so a hot host splits across ``salt_n`` tasks and
    no phase-2 group exceeds salt_n × hot_per_host rows."""
    order = frontier_order()
    df = frontier.withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(salt_n)))
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    df = df.withColumn("__rk1", F.row_number().over(w1)).drop("__salt")
    survivors = df.filter(F.col("__rk1") <= hot_per_host)
    deep_cold = df.filter(F.col("__rk1") > hot_per_host)
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = survivors.withColumn("__rk2", F.row_number().over(w2))
    tiered = ranked.withColumn(
        "__tier",
        F.when(F.col("__rk2") <= hot_per_host, F.lit(0)).otherwise(F.lit(1)).cast("int"),
    ).drop("__rk2")
    return tiered.unionByName(
        deep_cold.withColumn("__tier", F.lit(1).cast("int"))
    ).drop("__rk1")


def schedule_round(
    frontier: DataFrame,
    host_policy: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    round_budget_ms: int = DEFAULT_ROUND_BUDGET_MS,
    salt_n: int = DEFAULT_SALT_N,
    policy_empty: bool | None = None,
    agent: str = "*",
) -> DataFrame:
    """Full politeness stage: policy join + filters + budget cut."""
    return budget_cut(
        apply_policy(
            frontier, host_policy, default_budget,
            policy_empty=policy_empty, agent=agent,
        ),
        round_budget_ms=round_budget_ms,
        salt_n=salt_n,
    )
