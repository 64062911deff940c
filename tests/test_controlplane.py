"""REST control plane: the reference's workflow API service
(cmd/workflow/main.go route table, apis/flow.go + apis/action.go
handlers) and the webhook trigger service (cmd/webhook-trigger/main.go),
re-expressed over the file-backed FlowStore.

Three layers under test:
- FlowStore semantics alone (create/version/list/update/delete, mirrored
  from storage_workflow_mongodb.go);
- the HTTP surface end-to-end through urllib against a live server
  (status codes, clamps, quirks mirrored from the fiber handlers);
- the bridge to the data plane: a flow DEFINED OVER HTTP runs on
  FlowRuntime identically to the same flow built in code, and a webhook
  POST /trigger feeds the streaming interpreter.
"""

import json
import urllib.error
import urllib.request

import pytest

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.plans.controlplane import ControlPlane, FlowNotFound, FlowStore
from spider_go_spark.plans.flow import FlowCatalog, FlowRuntime, row_worker


def echo_b(values, config):
    return [("success", {"value": values["value"]})]


CHAIN_ACTIONS = [
    {"key": "a1", "action_id": "test-action-a"},
    {
        "key": "a2",
        "action_id": "test-action-b",
        "mapper": {
            "value": {"mode": "expression", "value": "a1.output.value + '_updatedx1'"}
        },
    },
    {
        "key": "a3",
        "action_id": "test-action-b",
        "mapper": {
            "value": {"mode": "expression", "value": "a2.output.value + '_updatedx2'"}
        },
        "meta": {"note": "sink"},
    },
]
CHAIN_PEERS = [
    {"parent_key": "a1", "meta_output": "triggered", "child_key": "a2"},
    {"parent_key": "a2", "meta_output": "success", "child_key": "a3"},
]


# ---------------------------------------------------------------------------
# FlowStore semantics (storage_workflow_mongodb.go)
# ---------------------------------------------------------------------------


def test_store_create_version_and_detail(tmp_path):
    store = FlowStore(str(tmp_path / "flows"))
    res = store.create_flow(
        "t1", "My Workflow", "event", {"team": "x"}, CHAIN_ACTIONS, CHAIN_PEERS
    )
    assert res == {"flow_id": "f-000001", "flow_name": "My Workflow"}

    # draft + version 1 + one bump per AddAction (mongo :615-620, :164)
    flows = store.list_flows("t1")["flows"]
    assert flows[0]["status"] == "draft"
    assert flows[0]["version"] == 1 + len(CHAIN_ACTIONS)

    detail = store.get_flow("t1", "f-000001")
    assert detail["flow_name"] == "My Workflow"
    assert [a["key"] for a in detail["actions"]] == ["a1", "a2", "a3"]
    a3 = detail["actions"][2]
    assert a3["map"]["value"]["mode"] == "expression"
    assert a3["meta"] == {"note": "sink"}
    assert detail["peers"] == CHAIN_PEERS


def test_store_mutations_bump_version_and_cascade(tmp_path):
    store = FlowStore(str(tmp_path / "flows"))
    fid = store.create_flow("t1", "wf", actions=CHAIN_ACTIONS, peers=CHAIN_PEERS)[
        "flow_id"
    ]
    v0 = store.list_flows("t1")["flows"][0]["version"]

    store.disable_action("t1", fid, "a3")  # version++ (mongo :400)
    assert store.list_flows("t1")["flows"][0]["version"] == v0 + 1
    assert store.catalog("t1", fid).action("a3").disabled

    # unknown key: silent no-op, but UpdateOne still ran → quirk: no error
    store.disable_action("t1", fid, "nope")

    updated = store.update_action(  # version++ (mongo :542)
        "t1", fid, "a2",
        config={"tag": "T"},
        mapper={"value": {"mode": "key", "value": "a1.output.value"}},
        meta={"who": "ops"},
    )
    assert updated["config"] == {"tag": "T"}
    cat = store.catalog("t1", fid)
    assert cat.action("a2").config == {"tag": "T"}
    assert cat.action("a2").mapper["value"].mode == "key"
    assert store.list_flows("t1")["flows"][0]["version"] == v0 + 3

    # UpdateFlow sets fields without a version bump (mongo :675-699)
    flow = store.update_flow("t1", fid, "renamed", "schedule", {"m": "1"}, "active")
    assert (flow["name"], flow["trigger_type"], flow["status"]) == (
        "renamed", "schedule", "active",
    )
    assert flow["version"] == v0 + 3

    # delete cascades (the document carries actions+deps) and is idempotent
    store.delete_flow("t1", fid)
    store.delete_flow("t1", fid)
    with pytest.raises(FlowNotFound):
        store.get_flow("t1", fid)


def test_store_tenant_isolation_and_ordering(tmp_path):
    store = FlowStore(str(tmp_path / "flows"))
    for i in range(5):
        store.create_flow("t1", f"wf-{i}")
    store.create_flow("t2", "other")

    # newest-first (mongo sort _id desc, :421-424), total per tenant
    page = store.list_flows("t1", page=1, page_size=2)
    assert [f["name"] for f in page["flows"]] == ["wf-4", "wf-3"]
    assert (page["total"], page["page"], page["page_size"]) == (5, 1, 2)
    assert [f["name"] for f in store.list_flows("t1", 3, 2)["flows"]] == ["wf-0"]
    assert store.list_flows("t2")["total"] == 1
    with pytest.raises(FlowNotFound):
        store.get_flow("t2", store.list_flows("t1")["flows"][0]["id"])


# ---------------------------------------------------------------------------
# HTTP surface (apis/flow.go, apis/action.go via cmd/workflow/main.go routes)
# ---------------------------------------------------------------------------


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


@pytest.fixture()
def plane(tmp_path):
    cp = ControlPlane(
        FlowStore(str(tmp_path / "flows")), trigger_root=str(tmp_path / "triggers")
    )
    port = cp.start()
    yield cp, port
    cp.stop()


def test_http_crud_matrix(plane):
    cp, port = plane
    assert _call(port, "GET", "/healthz")[0] == 200

    # create: 400 without a name (apis/flow.go:44-47), 200 with
    assert _call(port, "POST", "/tenants/t1/flows", {"actions": []})[0] == 400
    status, res = _call(
        port, "POST", "/tenants/t1/flows",
        {"name": "My Workflow", "trigger_type": "event",
         "actions": CHAIN_ACTIONS, "peers": CHAIN_PEERS},
    )
    assert status == 200 and res == {"flow_id": "f-000001", "flow_name": "My Workflow"}

    # list: clamps mirrored from apis/flow.go:108-117
    for _ in range(3):
        _call(port, "POST", "/tenants/t1/flows", {"name": "filler"})
    status, page = _call(port, "GET", "/tenants/t1/flows?page=0&page_size=200")
    assert status == 200
    assert (page["page"], page["page_size"], page["total"]) == (1, 20, 4)
    assert page["flows"][-1]["name"] == "My Workflow"  # newest-first
    status, page = _call(port, "GET", "/tenants/t1/flows?page=2&page_size=3")
    assert [f["name"] for f in page["flows"]] == ["My Workflow"]

    # get: detail + 404 (apis/flow.go:156-159)
    status, detail = _call(port, "GET", "/tenants/t1/flows/f-000001")
    assert status == 200 and [a["key"] for a in detail["actions"]] == ["a1", "a2", "a3"]
    assert _call(port, "GET", "/tenants/t1/flows/missing")[0] == 404
    assert _call(port, "GET", "/tenants/other/flows/f-000001")[0] == 404

    # update flow: 400 without name, 500 on unknown id (apis/flow.go:204-223)
    assert _call(port, "PUT", "/tenants/t1/flows/f-000001", {"status": "active"})[0] == 400
    status, flow = _call(
        port, "PUT", "/tenants/t1/flows/f-000001",
        {"name": "renamed", "trigger_type": "schedule", "status": "active"},
    )
    assert status == 200 and flow["status"] == "active"
    assert _call(
        port, "PUT", "/tenants/t1/flows/missing", {"name": "x"}
    )[0] == 500

    # action routes (apis/action.go; /workflows/ not /flows/ — main.go:65-66)
    status, _ = _call(
        port, "POST", "/tenants/t1/workflows/f-000001/actions/a3/disable"
    )
    assert status == 200
    status, action = _call(
        port, "PUT", "/tenants/t1/workflows/f-000001/actions/a2",
        {"config": {"k": "v"}, "mapper": {"value": {"mode": "key", "value": "a1.output.value"}}},
    )
    assert status == 200 and action["config"] == {"k": "v"}
    assert _call(
        port, "PUT", "/tenants/t1/workflows/f-000001/actions/ghost", {"config": {}}
    )[0] == 500

    status, detail = _call(port, "GET", "/tenants/t1/flows/f-000001")
    assert [a["disabled"] for a in detail["actions"]] == [False, False, True]

    # delete: 204, idempotent (apis/flow.go:255-260)
    assert _call(port, "DELETE", "/tenants/t1/flows/f-000001")[0] == 204
    assert _call(port, "DELETE", "/tenants/t1/flows/f-000001")[0] == 204
    assert _call(port, "GET", "/tenants/t1/flows/f-000001")[0] == 404

    assert _call(port, "GET", "/nope")[0] == 404


# ---------------------------------------------------------------------------
# bridge to the data plane
# ---------------------------------------------------------------------------


def test_http_defined_flow_runs_on_runtime(plane, spark):
    """A flow created over the wire interprets identically to the same
    flow built directly in code — the control plane feeds the engine."""
    cp, port = plane
    status, res = _call(
        port, "POST", "/tenants/t1/flows",
        {"name": "chain", "actions": CHAIN_ACTIONS, "peers": CHAIN_PEERS},
    )
    assert status == 200
    cat = cp.store.catalog("t1", res["flow_id"])

    workers = {"test-action-b": row_worker(echo_b, "value string")}
    trig = spark.createDataFrame(
        [("t1", "hello"), ("t2", "world")], "task_id string, value string"
    )
    got = FlowRuntime(spark, cat, workers).trigger("a1", "triggered", trig)

    direct = (
        FlowCatalog(res["flow_id"])
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
    want = FlowRuntime(spark, direct, workers).trigger("a1", "triggered", trig)
    for key in ("a2", "a3"):
        assert sorted(map(repr, got.delivered_rows(key))) == sorted(
            map(repr, want.delivered_rows(key))
        )
    assert {r["value"] for r in got.delivered_rows("a3")} == {
        "hello_updatedx1_updatedx2", "world_updatedx1_updatedx2"
    }


def test_webhook_trigger_feeds_streaming_interpreter(plane, spark, tmp_path):
    """POST /trigger drops a one-row parquet trigger file that the
    streaming interpreter consumes through the flow DAG — the reference's
    webhook-trigger → NATS → workflow path (webhook-trigger/main.go:33-67)
    over the file-drop trigger subject."""
    from spider_go_spark.streaming.flowstream import flow_stream_query, read_flow_sink

    cp, port = plane
    status, res = _call(
        port, "POST", "/tenants/t1/flows",
        {"name": "hooked",
         "actions": [
             {"key": "a1", "action_id": "webhook-action"},
             {"key": "a2", "action_id": "test-action-b",
              "mapper": {"value": {"mode": "key", "value": "a1.output.value"}}},
         ],
         "peers": [{"parent_key": "a1", "meta_output": "triggered", "child_key": "a2"}]},
    )
    assert status == 200
    fid = res["flow_id"]

    for payload in ("first", {"n": 2}):
        status, ack = _call(
            port, "POST", "/trigger",
            {"workflow_id": fid, "key": "a1", "value": payload},
        )
        assert status == 200 and ack["meta_output"] == "triggered"
    assert _call(port, "POST", "/trigger", {"key": "a1"})[0] == 400

    q = flow_stream_query(
        spark,
        cp.store.catalog("t1", fid),
        {"test-action-b": row_worker(echo_b, "value string")},
        trigger_key="a1",
        meta_output="triggered",
        trigger_dir=f"{cp.trigger_root}/{fid}",
        trigger_schema="task_id string, key string, value string",
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink_keys=["a2"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = read_flow_sink(spark, str(tmp_path / "out"), "a2").collect()
    # payloads ride as the reference's JSON-string Values
    assert sorted(r.value for r in rows) == ['"first"', '{"n": 2}']


def test_swagger_doc_matches_live_routes(plane):
    """/swagger/doc.json serves the OpenAPI document (≙ the generated
    swagger at /swagger/*, main.go:55) and every documented path+verb is
    actually routable — the spec is built from the same table, so this
    guards the one place they could drift (path template vs regex)."""
    import re as _re

    from spider_go_spark.plans.controlplane import _ROUTES

    cp, port = plane
    status, spec = _call(port, "GET", "/swagger/doc.json")
    assert status == 200
    assert spec["info"]["title"] == "Spider Workflow API"  # main.go:3
    for path, verbs in spec["paths"].items():
        concrete = _re.sub(r"\{[^}]+\}", "x1", path)
        for verb in verbs:
            assert any(
                v == verb.upper() and pat.match(concrete)
                for v, pat, _ in _ROUTES
            ), f"{verb.upper()} {path} documented but not routable"
    # and the doc covers the whole route table (webhook + swagger included)
    documented = {
        (verb.upper(), path) for path, verbs in spec["paths"].items() for verb in verbs
    }
    assert len(documented) == len(_ROUTES) - 1  # /swagger/doc.json itself undocumented
