"""Driver-gate queries for the generic flow interpreter (plans/flow.py):
the reference's three example topologies run on deterministic synthetic
trigger batches, with value-exact SQL oracles that RECOMPUTE the expected
deliveries from first principles (chain = nested concat, fan-out = a
cross join, branch = a CASE) — so the gate checks the interpreter's
routing/mapper/multi-emit semantics, not a copied constant.

Reference fixtures being reproduced: examples/basic/cmd/workflow/main.go
(a1→a2→a3 chain with expression mappers), cmd/fd-order-worker/main.go
(1→10 multi-emit), cmd/control-flow-worker/main.go (yes/no branch)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.plans.flow import FlowCatalog, FlowRuntime, row_worker

N_TRIGGERS = 20


def _trigger_df(spark: SparkSession, n: int, fields) -> DataFrame:
    return spark.range(n).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("task_id"), *fields
    )


def _delivered_union(res, key: str) -> DataFrame:
    dfs = [df.select("val.*") for df in res.delivered[key]]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# -- chain (examples/basic): a1 --triggered--> a2 --success--> a3 ------------

def _echo_b(values, config):
    return [("success", {"value": values["value"]})]


def flow_chain_mapped(spark: SparkSession, sf: str) -> DataFrame:
    cat = (
        FlowCatalog("wa")
        .add_action("a1", "test-action-a")
        .add_action(
            "a2", "test-action-b",
            mapper={"value": Mapper("expression", "a1.output.value + '_updatedx1'")},
        )
        .add_action(
            "a3", "test-action-b",
            mapper={"value": Mapper("expression", "a2.output.value + '_updatedx2'")},
        )
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "a3")
    )
    rt = FlowRuntime(
        spark, cat, {"test-action-b": row_worker(_echo_b, "value string")}
    )
    trig = _trigger_df(
        spark, N_TRIGGERS,
        [F.concat(F.lit("v"), F.col("id").cast("string")).alias("value")],
    )
    res = rt.trigger("a1", "triggered", trig)
    return _delivered_union(res, "a3")


FLOW_CHAIN_SQL = f"""
SELECT concat('v', CAST(r AS VARCHAR), '_updatedx1', '_updatedx2') AS value
FROM range({N_TRIGGERS}) t(r)
"""


# -- multi-emit fan-out (fd-order): start → fd(1→10) → sink ------------------

def _fd_order(values, config):
    return [
        ("success", {"order_id": f"order@{i + 1}", "src": values["value"]})
        for i in range(10)
    ]


def flow_fanout_orders(spark: SparkSession, sf: str) -> DataFrame:
    cat = (
        FlowCatalog("orders")
        .add_action("start", "trigger-action")
        .add_action("fd", "fd-order-action",
                    mapper={"value": Mapper("key", "start.output.value")})
        .add_action("sink", "sink-action",
                    mapper={"order_id": Mapper("key", "fd.output.order_id"),
                            "src": Mapper("key", "fd.output.src")})
        .add_dep("start", "triggered", "fd")
        .add_dep("fd", "success", "sink")
    )
    rt = FlowRuntime(
        spark, cat,
        {"fd-order-action": row_worker(_fd_order, "order_id string, src string")},
    )
    trig = _trigger_df(
        spark, 5, [F.concat(F.lit("job"), F.col("id").cast("string")).alias("value")]
    )
    res = rt.trigger("start", "triggered", trig)
    return _delivered_union(res, "sink")


FLOW_FANOUT_SQL = """
SELECT concat('order@', CAST(o + 1 AS VARCHAR)) AS order_id,
       concat('job', CAST(j AS VARCHAR)) AS src
FROM range(5) a(j) CROSS JOIN range(10) b(o)
"""


# -- conditional branch (control-flow-worker): yes/no routing ----------------

def _condition(values, config):
    return [("yes" if values["flag"] else "no", {"name": values["name"]})]


def _tagger(values, config):
    return [("ok", {"value": values["value"] + "|" + config["tag"]})]


def flow_branch_split(spark: SparkSession, sf: str) -> DataFrame:
    cat = (
        FlowCatalog("cf")
        .add_action("start", "trigger-action")
        .add_action("cond", "condition-action",
                    mapper={"flag": Mapper("key", "start.output.flag"),
                            "name": Mapper("key", "start.output.name")})
        .add_action("y", "tag-action", config={"tag": "YES"},
                    mapper={"value": Mapper("key", "cond.output.name")})
        .add_action("n", "tag-action", config={"tag": "NO"},
                    mapper={"value": Mapper("key", "cond.output.name")})
        .add_action("out", "sink-action",
                    mapper={"tagged": Mapper("expression", "y.output.value")})
        .add_action("out2", "sink-action",
                    mapper={"tagged": Mapper("expression", "n.output.value")})
        .add_dep("start", "triggered", "cond")
        .add_dep("cond", "yes", "y")
        .add_dep("cond", "no", "n")
        .add_dep("y", "ok", "out")
        .add_dep("n", "ok", "out2")
    )
    rt = FlowRuntime(
        spark, cat,
        {"condition-action": row_worker(_condition, "name string"),
         "tag-action": row_worker(_tagger, "value string")},
    )
    trig = _trigger_df(
        spark, N_TRIGGERS,
        [(F.col("id") % 3 == 0).alias("flag"),
         F.concat(F.lit("n"), F.col("id").cast("string")).alias("name")],
    )
    res = rt.trigger("start", "triggered", trig)
    return (
        _delivered_union(res, "out")
        .unionByName(_delivered_union(res, "out2"))
    )


FLOW_BRANCH_SQL = f"""
SELECT concat('n', CAST(r AS VARCHAR), '|',
              CASE WHEN r % 3 = 0 THEN 'YES' ELSE 'NO' END) AS tagged
FROM range({N_TRIGGERS}) t(r)
"""


# -- $trigger alias (workflow.go:128): trigger values addressable at depth ---

def flow_trigger_alias(spark: SparkSession, sf: str) -> DataFrame:
    """Two hops down the chain, the sink's mapper mixes the $trigger alias
    with the nearer context in one expression — the oracle recomputes both
    from the trigger rule, so a broken alias (missing field, wrong ride-
    along through the withField merges) breaks the concat."""
    cat = (
        FlowCatalog("alias")
        .add_action("a1", "test-action-a")
        .add_action("a2", "test-action-b",
                    mapper={"value": Mapper("expression", "a1.output.value + '_m'")})
        .add_action(
            "sink", "sink-action",
            mapper={"pair": Mapper(
                "expression", "$trigger.output.value + ':' + a2.output.value"
            )},
        )
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "sink")
    )
    rt = FlowRuntime(
        spark, cat, {"test-action-b": row_worker(_echo_b, "value string")}
    )
    trig = _trigger_df(
        spark, N_TRIGGERS,
        [F.concat(F.lit("v"), F.col("id").cast("string")).alias("value")],
    )
    res = rt.trigger("a1", "triggered", trig)
    return _delivered_union(res, "sink")


FLOW_ALIAS_SQL = f"""
SELECT concat('v', CAST(r AS VARCHAR), ':',
              'v', CAST(r AS VARCHAR), '_m') AS pair
FROM range({N_TRIGGERS}) t(r)
"""


QUERIES = {
    "flow_chain_mapped": flow_chain_mapped,
    "flow_fanout_orders": flow_fanout_orders,
    "flow_branch_split": flow_branch_split,
    "flow_trigger_alias": flow_trigger_alias,
}

ORACLES = {
    "flow_chain_mapped": FLOW_CHAIN_SQL,
    "flow_fanout_orders": FLOW_FANOUT_SQL,
    "flow_branch_split": FLOW_BRANCH_SQL,
    "flow_trigger_alias": FLOW_ALIAS_SQL,
}
