"""Generic user-defined flow DAGs: the Spark interpreter must reproduce
the reference's three example topologies (chain with expression mappers =
examples/basic; 1→N multi-emit = cmd/fd-order-worker; conditional branch
= cmd/control-flow-worker) plus diamond fan-in and disabled drops — each
checked against the pure-Python workflow oracle."""

import pandas as pd
import pytest

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.oracle.floworacle import OracleFlow, flow_oracle
from spider_go_spark.plans.flow import (
    FlowCatalog,
    FlowRuntime,
    Worker,
    row_worker,
)


def _sorted_vals(rows, key=None):
    return sorted((tuple(sorted(r.items())) for r in rows))


# per-message handlers in the reference's exact shape — shared between the
# engine (via row_worker) and the oracle (directly)
def echo_b(values, config):
    # ≙ examples/basic worker-b: pass the value through, tagged success
    return [("success", {"value": values["value"]})]


def fd_order(values, config):
    # ≙ cmd/fd-order-worker: one input → ten outputs
    return [("success", {"order_id": f"order@{i + 1}"}) for i in range(10)]


def condition(values, config):
    # ≙ cmd/control-flow-worker: route on a boolean
    return [("yes" if values["condition"] else "no", {})]


def tag(values, config):
    return [("ok", {"value": values.get("value", "") + "|" + config.get("tag", "")})]


# --------------------------------------------------------------------------
# chain (examples/basic): a1 --triggered--> a2 --success--> a3
# --------------------------------------------------------------------------


def test_chain_with_expression_mappers(spark):
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
    workers = {"test-action-b": row_worker(echo_b, "value string")}
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame(
        [("t1", "hello"), ("t2", "world")], "task_id string, value string"
    )
    res = rt.trigger("a1", "triggered", trig)

    oflow = (
        OracleFlow()
        .add_action("a1", "test-action-a")
        .add_action(
            "a2", "test-action-b",
            mapper={"value": lambda c: c["a1"]["output"]["value"] + "_updatedx1"},
        )
        .add_action(
            "a3", "test-action-b",
            mapper={"value": lambda c: c["a2"]["output"]["value"] + "_updatedx2"},
        )
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "a3")
    )
    expect = flow_oracle(
        oflow, {"test-action-b": echo_b}, "a1", "triggered",
        [{"value": "hello"}, {"value": "world"}],
    )
    assert _sorted_vals(res.delivered_rows("a2")) == _sorted_vals(expect["a2"])
    assert _sorted_vals(res.delivered_rows("a3")) == _sorted_vals(expect["a3"])
    assert {r["value"] for r in res.delivered_rows("a3")} == {
        "hello_updatedx1_updatedx2", "world_updatedx1_updatedx2"
    }


# --------------------------------------------------------------------------
# multi-emit fan-out (fd-order): trigger → fd → sink (1 → 10 each)
# --------------------------------------------------------------------------


def test_multi_emit_fanout(spark):
    cat = (
        FlowCatalog("orders")
        .add_action("start", "trigger-action")
        .add_action("fd", "fd-order-action", mapper={"value": Mapper("key", "start.output.value")})
        .add_action("sink", "sink-action", mapper={"order_id": Mapper("key", "fd.output.order_id")})
        .add_dep("start", "triggered", "fd")
        .add_dep("fd", "success", "sink")
    )
    workers = {"fd-order-action": row_worker(fd_order, "order_id string")}
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame(
        [("t1", "go"), ("t2", "go2"), ("t3", "go3")], "task_id string, value string"
    )
    res = rt.trigger("start", "triggered", trig)

    oflow = (
        OracleFlow()
        .add_action("start", "trigger-action")
        .add_action("fd", "fd-order-action",
                    mapper={"value": lambda c: c["start"]["output"]["value"]})
        .add_action("sink", "sink-action",
                    mapper={"order_id": lambda c: c["fd"]["output"]["order_id"]})
        .add_dep("start", "triggered", "fd")
        .add_dep("fd", "success", "sink")
    )
    expect = flow_oracle(
        oflow, {"fd-order-action": fd_order}, "start", "triggered",
        [{"value": "go"}, {"value": "go2"}, {"value": "go3"}],
    )
    got = res.delivered_rows("sink")
    assert len(got) == 30  # 3 triggers × 10 emits
    assert _sorted_vals(got) == _sorted_vals(expect["sink"])
    # per-emit child task ids are distinct and deterministic
    ids = [
        r["task_id"]
        for df in res.delivered["sink"]
        for r in df.select("task_id").collect()
    ]
    assert len(ids) == len(set(ids)) == 30
    assert all("/sink#" in i for i in ids)


# --------------------------------------------------------------------------
# conditional branch (control-flow-worker): yes/no routing
# --------------------------------------------------------------------------


def test_conditional_branch_routing(spark):
    cat = (
        FlowCatalog("cf")
        .add_action("start", "trigger-action")
        .add_action("cond", "condition-action",
                    mapper={"condition": Mapper("key", "start.output.condition"),
                            "name": Mapper("key", "start.output.name")})
        .add_action("y", "tag-action", config={"tag": "YES"},
                    mapper={"value": Mapper("key", "cond.output.name")})
        .add_action("n", "tag-action", config={"tag": "NO"},
                    mapper={"value": Mapper("key", "cond.output.name")})
        .add_dep("start", "triggered", "cond")
        .add_dep("cond", "yes", "y")
        .add_dep("cond", "no", "n")
    )

    def condition_named(values, config):
        # emit the branch label and carry the name through the output
        return [("yes" if values["condition"] else "no", {"name": values["name"]})]

    workers = {
        "condition-action": row_worker(condition_named, "name string"),
        "tag-action": row_worker(tag, "value string"),
    }
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame(
        [("t1", True, "alpha"), ("t2", False, "beta"), ("t3", True, "gamma")],
        "task_id string, condition boolean, name string",
    )
    res = rt.trigger("start", "triggered", trig)

    oflow = (
        OracleFlow()
        .add_action("start", "trigger-action")
        .add_action("cond", "condition-action",
                    mapper={"condition": lambda c: c["start"]["output"]["condition"],
                            "name": lambda c: c["start"]["output"]["name"]})
        .add_action("y", "tag-action", config={"tag": "YES"},
                    mapper={"value": lambda c: c["cond"]["output"]["name"]})
        .add_action("n", "tag-action", config={"tag": "NO"},
                    mapper={"value": lambda c: c["cond"]["output"]["name"]})
        .add_dep("start", "triggered", "cond")
        .add_dep("cond", "yes", "y")
        .add_dep("cond", "no", "n")
    )
    expect = flow_oracle(
        oflow, {"condition-action": condition_named, "tag-action": tag},
        "start", "triggered",
        [{"condition": True, "name": "alpha"},
         {"condition": False, "name": "beta"},
         {"condition": True, "name": "gamma"}],
    )
    assert _sorted_vals(res.delivered_rows("y")) == _sorted_vals(expect["y"])
    assert _sorted_vals(res.delivered_rows("n")) == _sorted_vals(expect["n"])
    assert {r["value"] for r in res.delivered_rows("y")} == {"alpha", "gamma"}
    assert {r["value"] for r in res.delivered_rows("n")} == {"beta"}
    # tag-action outputs flowed too (config reached the handler)
    assert {r["value"] for r in expect.get("ysink", [])} == set()


# --------------------------------------------------------------------------
# diamond fan-in: a → b, a → c, b → d, c → d (two deliveries per trigger)
# --------------------------------------------------------------------------


def test_diamond_fan_in_contexts_stay_per_path(spark):
    cat = (
        FlowCatalog("dia")
        .add_action("a", "trigger-action")
        .add_action("b", "tag-action", config={"tag": "B"},
                    mapper={"value": Mapper("key", "a.output.value")})
        .add_action("c", "tag-action", config={"tag": "C"},
                    mapper={"value": Mapper("key", "a.output.value")})
        .add_action("d", "sink-action",
                    # b-path context has b, c-path has c: a diamond child
                    # sees ONE parent per message (per-path context)
                    mapper={"value": Mapper("expression", "a.output.value + '_d'")},
                    )
        .add_dep("a", "triggered", "b")
        .add_dep("a", "triggered", "c")
        .add_dep("b", "ok", "d")
        .add_dep("c", "ok", "d")
    )
    workers = {"tag-action": row_worker(tag, "value string")}
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame([("t1", "xy")], "task_id string, value string")
    res = rt.trigger("a", "triggered", trig)

    oflow = (
        OracleFlow()
        .add_action("a", "trigger-action")
        .add_action("b", "tag-action", config={"tag": "B"},
                    mapper={"value": lambda c: c["a"]["output"]["value"]})
        .add_action("c", "tag-action", config={"tag": "C"},
                    mapper={"value": lambda c: c["a"]["output"]["value"]})
        .add_action("d", "sink-action",
                    mapper={"value": lambda c: c["a"]["output"]["value"] + "_d"})
        .add_dep("a", "triggered", "b")
        .add_dep("a", "triggered", "c")
        .add_dep("b", "ok", "d")
        .add_dep("c", "ok", "d")
    )
    expect = flow_oracle(
        oflow, {"tag-action": tag}, "a", "triggered", [{"value": "xy"}]
    )
    assert len(res.delivered_rows("d")) == 2  # one per path
    assert _sorted_vals(res.delivered_rows("d")) == _sorted_vals(expect["d"])


# --------------------------------------------------------------------------
# disabled actions drop messages at consume time
# --------------------------------------------------------------------------


def test_disabled_action_drops(spark):
    cat = (
        FlowCatalog("dis")
        .add_action("a", "trigger-action")
        .add_action("b", "tag-action", mapper={"value": Mapper("key", "a.output.value")},
                    disabled=True)
        .add_action("s", "sink-action", mapper={"value": Mapper("key", "b.output.value")})
        .add_dep("a", "triggered", "b")
        .add_dep("b", "ok", "s")
    )
    workers = {"tag-action": row_worker(tag, "value string")}
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame([("t1", "v")], "task_id string, value string")
    res = rt.trigger("a", "triggered", trig)
    # delivery to b is recorded (the message was SENT), but b never ran —
    # nothing reaches s, and the drop is counted
    assert res.delivered_rows("s") == []
    assert res.n_dropped_disabled == 1

    oflow = (
        OracleFlow()
        .add_action("a", "trigger-action")
        .add_action("b", "tag-action", disabled=True,
                    mapper={"value": lambda c: c["a"]["output"]["value"]})
        .add_action("s", "sink-action",
                    mapper={"value": lambda c: c["b"]["output"]["value"]})
        .add_dep("a", "triggered", "b")
        .add_dep("b", "ok", "s")
    )
    expect = flow_oracle(oflow, {"tag-action": tag}, "a", "triggered", [{"value": "v"}])
    assert expect.get("s", []) == []


# --------------------------------------------------------------------------
# plan + catalog shape
# --------------------------------------------------------------------------


def test_handler_runs_as_arrow_map_stage(spark):
    """The handler stage must be MapInPandas (Arrow), never row-at-a-time
    BatchEvalPython, and routing/mapping stays pure Catalyst."""
    cat = (
        FlowCatalog("p")
        .add_action("a", "trigger-action")
        .add_action("fd", "fd-order-action", mapper={"value": Mapper("key", "a.output.value")})
        .add_action("sink", "sink-action", mapper={"order_id": Mapper("key", "fd.output.order_id")})
        .add_dep("a", "triggered", "fd")
        .add_dep("fd", "success", "sink")
    )
    rt = FlowRuntime(spark, cat, {"fd-order-action": row_worker(fd_order, "order_id string")})
    trig = spark.createDataFrame([("t1", "x")], "task_id string, value string")
    res = rt.trigger("a", "triggered", trig)
    plan = res.delivered["sink"][0]._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_catalog_dim_tables_and_validation(spark):
    cat = (
        FlowCatalog("v")
        .add_action("a", "trigger-action")
        .add_action("b", "x-action")
        .add_dep("a", "triggered", "b")
    )
    assert cat.actions_df(spark).count() == 2
    edges = cat.edges_df(spark).collect()
    assert [(e.parent_key, e.meta_output, e.child_key) for e in edges] == [
        ("a", "triggered", "b")
    ]
    with pytest.raises(ValueError, match="already defined"):
        cat.add_action("a", "dup")
    with pytest.raises(ValueError, match="unknown action key"):
        cat.add_dep("a", "ok", "zzz")
    # a mid-DAG action consuming a message with no worker is a wiring bug
    # (a message would silently dead-end), surfaced at consume time —
    # trigger actions legitimately have edges and no worker
    cat2 = (
        FlowCatalog("v2")
        .add_action("a", "trigger-action")
        .add_action("b", "handler-less")
        .add_action("c", "sink")
        .add_dep("a", "t", "b")
        .add_dep("b", "ok", "c")
    )
    rt2 = FlowRuntime(spark, cat2, {})
    trig = spark.createDataFrame([("t1", "v")], "task_id string, value string")
    with pytest.raises(ValueError, match="no registered worker"):
        rt2.trigger("a", "t", trig)


def test_vectorized_worker_contract(spark):
    """A natively-vectorized Worker (pandas in/out, no row loop) is the
    hot-path contract; must compose identically with the runtime."""
    cat = (
        FlowCatalog("vec")
        .add_action("a", "trigger-action")
        .add_action("sq", "square-action", mapper={"x": Mapper("key", "a.output.x")})
        .add_action("out", "sink-action", mapper={"y": Mapper("key", "sq.output.y")})
        .add_dep("a", "triggered", "sq")
        .add_dep("sq", "done", "out")
    )

    def square(pdf: pd.DataFrame, config: dict) -> pd.DataFrame:
        return pd.DataFrame(
            {"task_id": pdf["task_id"], "meta_output": "done", "y": pdf["x"] * pdf["x"]}
        )

    rt = FlowRuntime(spark, cat, {"square-action": Worker(square, "y bigint")})
    trig = spark.createDataFrame(
        [("t1", 3), ("t2", 5)], "task_id string, x bigint"
    )
    res = rt.trigger("a", "triggered", trig)
    assert sorted(r["y"] for r in res.delivered_rows("out")) == [9, 25]


def test_nested_string_paths_in_mappers(spark):
    """len()/+ on NESTED context fields resolve by static type: the mapper
    knows a1.output.value is a string through the struct schema, so len()
    compiles to length() and + to concat (this exact shape failed before
    string_paths existed)."""
    from spider_go_spark.functions.mapper import string_paths

    cat = (
        FlowCatalog("nested")
        .add_action("a", "trigger-action")
        .add_action(
            "s", "sink-action",
            mapper={"n": Mapper("expression", "string(len(a.output.value))"),
                    "v": Mapper("expression", "a.output.value + '!'")},
        )
        .add_dep("a", "triggered", "s")
    )
    rt = FlowRuntime(spark, cat, {})
    trig = spark.createDataFrame(
        [("t1", "abc"), ("t2", "hello")], "task_id string, value string"
    )
    res = rt.trigger("a", "triggered", trig)
    got = _sorted_vals(res.delivered_rows("s"))
    assert got == _sorted_vals(
        [{"n": "3", "v": "abc!"}, {"n": "5", "v": "hello!"}]
    )
    # helper sanity: nested + top-level string paths both found
    df = spark.createDataFrame([("x", (("y",),))], "a string, b struct<c:struct<d:string>>")
    assert string_paths(df.schema) == {"a", "b.c.d"}


# --------------------------------------------------------------------------
# persistence: save/load round-trips the full definition (≙ CreateFlow
# storing to Mongo + the engine reloading on boot) and the reloaded flow
# produces identical deliveries
# --------------------------------------------------------------------------


def test_catalog_save_load_roundtrip(spark, tmp_path):
    cat = (
        FlowCatalog("persisted")
        .add_action("a1", "trigger-action", config={"k": "v"})
        .add_action(
            "a2", "test-action-b",
            mapper={
                "value": Mapper("expression", "a1.output.value + '_x'"),
                "tagged": Mapper("fixed", "constant"),
            },
        )
        .add_action("dead", "test-action-b", disabled=True)
        .add_action("sink", "sink-action", mapper={"v": Mapper("key", "a2.output.value")})
        .add_dep("a1", "triggered", "a2")
        .add_dep("a1", "triggered", "dead")
        .add_dep("a2", "success", "sink")
    )
    path = str(tmp_path / "flow.json")
    cat.save(path)
    loaded = FlowCatalog.load(path)
    assert loaded.to_dict() == cat.to_dict()

    workers = {"test-action-b": row_worker(echo_b, "value string")}
    trig = spark.createDataFrame([("t1", "hi")], "task_id string, value string")
    orig = FlowRuntime(spark, cat, workers).trigger("a1", "triggered", trig)
    redo = FlowRuntime(spark, loaded, workers).trigger("a1", "triggered", trig)
    assert _sorted_vals(orig.delivered_rows("sink")) == _sorted_vals(
        redo.delivered_rows("sink")
    )
    assert orig.n_dropped_disabled == redo.n_dropped_disabled == 1


# --------------------------------------------------------------------------
# "$trigger" context alias (workflow.go:128): set once at trigger time,
# addressable from any depth of the session
# --------------------------------------------------------------------------


def test_trigger_alias_addressable_at_depth(spark):
    cat = (
        FlowCatalog("alias")
        .add_action("a1", "trigger-action")
        .add_action("a2", "test-action-b", mapper={"value": Mapper("key", "a1.output.value")})
        .add_action(
            "a3", "test-action-b",
            # two hops down, still addressing the trigger alias — and mixing
            # it with the nearer context in one expression
            mapper={"value": Mapper("expression", "$trigger.output.value + ':' + a2.output.value")},
        )
        .add_action("sink", "sink-action", mapper={"v": Mapper("key", "$trigger.output.value")})
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "a3")
        .add_dep("a3", "success", "sink")
    )
    workers = {"test-action-b": row_worker(echo_b, "value string")}
    rt = FlowRuntime(spark, cat, workers)
    trig = spark.createDataFrame([("t1", "seed")], "task_id string, value string")
    res = rt.trigger("a1", "triggered", trig)

    oflow = (
        OracleFlow()
        .add_action("a1", "trigger-action")
        .add_action("a2", "test-action-b", mapper={"value": lambda c: c["a1"]["output"]["value"]})
        .add_action(
            "a3", "test-action-b",
            mapper={"value": lambda c: c["$trigger"]["output"]["value"] + ":" + c["a2"]["output"]["value"]},
        )
        .add_action("sink", "sink-action", mapper={"v": lambda c: c["$trigger"]["output"]["value"]})
        .add_dep("a1", "triggered", "a2")
        .add_dep("a2", "success", "a3")
        .add_dep("a3", "success", "sink")
    )
    expect = flow_oracle(
        oflow, {"test-action-b": echo_b}, "a1", "triggered", [{"value": "seed"}]
    )
    assert _sorted_vals(res.delivered_rows("a3")) == _sorted_vals(expect["a3"])
    assert _sorted_vals(res.delivered_rows("sink")) == _sorted_vals(expect["sink"])
    assert res.delivered_rows("a3") == [{"value": "seed:seed"}]
    assert res.delivered_rows("sink") == [{"v": "seed"}]
