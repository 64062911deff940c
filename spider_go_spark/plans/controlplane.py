"""REST control plane over the flow catalog — the reference's workflow
API service, re-expressed over the file-backed flow store.

Reference surface being reproduced (route-for-route,
/root/reference/cmd/workflow/main.go:50-66):

- ``GET    /healthz``
- ``GET    /tenants/{tid}/flows``                 (apis/flow.go:102-126)
- ``GET    /tenants/{tid}/flows/{id}``            (apis/flow.go:128-162)
- ``POST   /tenants/{tid}/flows``                 (apis/flow.go:9-89)
- ``PUT    /tenants/{tid}/flows/{flow_id}``       (apis/flow.go:164-226)
- ``DELETE /tenants/{tid}/flows/{flow_id}``       (apis/flow.go:228-261)
- ``POST   /tenants/{tid}/workflows/{wid}/actions/{key}/disable``
  (apis/action.go:11-52)
- ``PUT    /tenants/{tid}/workflows/{wid}/actions/{key}``
  (apis/action.go:54-124)
- ``POST   /trigger`` — the webhook-trigger service folded in
  (cmd/webhook-trigger/main.go:33-67): a JSON body
  ``{workflow_id, key, value}`` becomes a trigger message with
  ``meta_output="triggered"`` and a JSON-string payload.

Semantics mirrored from the Mongo storage adapter
(storage_workflow_mongodb.go):

- CreateFlow starts at ``status="draft"``, ``version=1`` (:611-638);
- every AddAction / UpdateAction / DisableWorkflowAction bumps the flow
  version (:164, :400, :542 via incrementFlowVersion :701-714), so a
  freshly created flow with N actions is at version 1+N;
- ListFlows is newest-first with a total count and echoed page/page_size
  (:408-455); the handler clamps page<1 → 1 and page_size outside
  [1,100] → 20 (apis/flow.go:108-117);
- UpdateFlow sets name/trigger_type/meta/status, no version bump (:675-699);
- DeleteFlow cascades to the flow's actions and deps (:560-600) and is
  idempotent (DeleteOne of a missing id is not an error → 204 either way);
- DisableAction of an unknown key is a silent no-op → 200 (UpdateOne
  matches nothing, no error surfaces — quirk mirrored deliberately).

Spark-first divergences (SURVEY §1.3 style):

- storage is the existing one-JSON-document-per-flow store
  (``FlowCatalog.save``), laid out ``root/<tenant>/<flow_id>.json`` — the
  definition is tiny control-plane metadata, so a directory of documents
  replaces the Mongo collections; writes are atomic renames;
- flow ids are a deterministic sequence ``f-%06d`` instead of uuidv7
  (same divergence as the engine's (round, rank) task ids: wall-clock
  identity is unreproducible under replay);
- the webhook trigger lands as a one-row parquet file in the flow's
  trigger inbox (``trigger_root/<workflow_id>/``) — the drop directory
  the streaming interpreter (streaming/flowstream.py) consumes as its
  trigger subject. Written with pyarrow on the serving thread: the
  control plane never needs a SparkSession.

The control plane is DRIVER-SIDE ADMIN PLUMBING — per-request work is a
dictionary lookup plus one small JSON document write; the data plane
(FlowRuntime / flow_stream_query) stays fully distributed and simply
loads definitions through ``FlowStore.catalog``.
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.plans.flow import FlowCatalog

_VALID_STATUS = {"draft", "active"}  # flow.go:5-8
_VALID_TRIGGER = {"event", "schedule"}  # flow.go:12-15


class FlowNotFound(KeyError):
    pass


def _mapper_from_json(doc: dict | None) -> dict[str, Mapper] | None:
    """``{"field": {"mode": ..., "value": ...}}`` → Mapper dict
    (the wire shape of spider.Mapper, storage.go:13-16)."""
    if not doc:
        return None
    return {name: Mapper(m["mode"], m["value"]) for name, m in doc.items()}


class FlowStore:
    """Multi-tenant flow-definition store (≙ the Mongo workflow /
    workflow_action / workflow_action_dep collections behind the API,
    storage_workflow_mongodb.go). One JSON document per flow under
    ``root/<tenant_id>/<flow_id>.json``; a ``_seq`` file supplies the
    deterministic id sequence. Single-writer (the control-plane process)
    with an in-process lock for its serving threads."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock = threading.RLock()

    # -- id sequence -------------------------------------------------------
    def _next_seq(self) -> int:
        path = os.path.join(self.root, "_seq")
        with self._lock:
            n = 0
            if os.path.exists(path):
                with open(path) as f:
                    n = int(f.read().strip() or 0)
            n += 1
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(n))
            os.replace(tmp, path)
            return n

    # -- document I/O ------------------------------------------------------
    def _path(self, tenant_id: str, flow_id: str) -> str:
        for part in (tenant_id, flow_id):
            if not re.fullmatch(r"[A-Za-z0-9._-]+", part or ""):
                raise FlowNotFound(f"bad id {part!r}")
        return os.path.join(self.root, tenant_id, f"{flow_id}.json")

    def _read(self, tenant_id: str, flow_id: str) -> dict:
        path = self._path(tenant_id, flow_id)
        if not os.path.exists(path):
            raise FlowNotFound(f"{tenant_id}/{flow_id}")
        with open(path) as f:
            return json.load(f)

    def _write(self, tenant_id: str, doc: dict) -> None:
        path = self._path(tenant_id, doc["flow"]["id"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic: readers never see a partial flow

    # -- usecase surface (usecase/flow.go) ---------------------------------
    def create_flow(
        self,
        tenant_id: str,
        name: str,
        trigger_type: str = "event",
        meta: dict | None = None,
        actions: list[dict] | None = None,
        peers: list[dict] | None = None,
    ) -> dict:
        """≙ Usecase.CreateFlow (usecase/flow.go:47-102): insert the flow
        at draft/version-1, then AddAction per action (each bumping the
        version) and AddDep per peer. Returns the FlowResponse shape."""
        if not name:
            raise ValueError("name is required")
        if trigger_type not in _VALID_TRIGGER:
            raise ValueError(f"unknown trigger_type {trigger_type!r}")
        with self._lock:
            flow_id = f"f-{self._next_seq():06d}"
            cat = FlowCatalog(flow_id)
            action_meta: dict[str, dict] = {}
            for a in actions or []:
                cat.add_action(
                    a["key"],
                    a["action_id"],
                    config=a.get("config") or {},
                    mapper=_mapper_from_json(a.get("mapper")),
                )
                if a.get("meta"):
                    action_meta[a["key"]] = a["meta"]
            for p in peers or []:
                cat.add_dep(p["parent_key"], p["meta_output"], p["child_key"])
            doc = {
                "flow": {
                    "id": flow_id,
                    "tenant_id": tenant_id,
                    "name": name,
                    "trigger_type": trigger_type,
                    "meta": meta or {},
                    "status": "draft",  # storage_workflow_mongodb.go:620
                    # version 1 + one bump per AddAction (:615, :164)
                    "version": 1 + len(actions or []),
                },
                "catalog": cat.to_dict(),
                "action_meta": action_meta,
            }
            self._write(tenant_id, doc)
            return {"flow_id": flow_id, "flow_name": name}

    def list_flows(self, tenant_id: str, page: int = 1, page_size: int = 20) -> dict:
        """≙ ListFlows (storage_workflow_mongodb.go:408-455): newest-first,
        total over the tenant, FlowListResponse shape. Clamping is the
        HANDLER's job (apis/flow.go:108-117) — mirrored in the HTTP layer,
        not here."""
        tdir = os.path.join(self.root, tenant_id)
        with self._lock:
            names = (
                sorted(n for n in os.listdir(tdir) if n.endswith(".json"))
                if os.path.isdir(tdir)
                else []
            )
            names.reverse()  # ids are a zero-padded sequence: lexical = creation order
            skip = (page - 1) * page_size
            flows = [
                self._read(tenant_id, n[: -len(".json")])["flow"]
                for n in names[skip : skip + page_size]
            ]
            return {
                "flows": flows,
                "total": len(names),
                "page": page,
                "page_size": page_size,
            }

    def get_flow(self, tenant_id: str, flow_id: str) -> dict:
        """≙ Usecase.GetFlow (usecase/flow.go:115-133): flow identity plus
        the stored actions in the WorkflowAction wire shape."""
        doc = self._read(tenant_id, flow_id)
        cat_doc = doc["catalog"]
        actions = [
            {
                "id": f"{flow_id}/{a['key']}",
                "key": a["key"],
                "tenant_id": tenant_id,
                "workflow_id": flow_id,
                "action_id": a["action_id"],
                "config": a["config"],
                "map": a["mapper"] or {},
                "meta": doc.get("action_meta", {}).get(a["key"], {}),
                "disabled": a["disabled"],
            }
            for a in cat_doc["actions"]
        ]
        return {
            "flow_id": flow_id,
            "flow_name": doc["flow"]["name"],
            "tenant_id": tenant_id,
            "actions": actions,
            # not in FlowDetailResponse, but edges are the other half of
            # the definition — exposed for parity with GetFlow consumers
            "peers": cat_doc["edges"],
        }

    def update_flow(
        self,
        tenant_id: str,
        flow_id: str,
        name: str,
        trigger_type: str,
        meta: dict | None,
        status: str,
    ) -> dict:
        """≙ UpdateFlow (storage_workflow_mongodb.go:675-699): set the four
        flow fields, no version bump, return the updated Flow."""
        if not name:
            raise ValueError("name is required")
        if status not in _VALID_STATUS:
            raise ValueError(f"unknown status {status!r}")
        if trigger_type not in _VALID_TRIGGER:
            raise ValueError(f"unknown trigger_type {trigger_type!r}")
        with self._lock:
            doc = self._read(tenant_id, flow_id)
            doc["flow"].update(
                name=name, trigger_type=trigger_type, meta=meta or {}, status=status
            )
            self._write(tenant_id, doc)
            return dict(doc["flow"])

    def delete_flow(self, tenant_id: str, flow_id: str) -> None:
        """≙ DeleteFlow (storage_workflow_mongodb.go:560-600): the flow
        document carries its actions and deps, so removing it IS the
        cascade; idempotent like DeleteOne on a missing id."""
        try:
            path = self._path(tenant_id, flow_id)
        except FlowNotFound:
            return
        with self._lock:
            if os.path.exists(path):
                os.remove(path)

    def _mutate_catalog(self, tenant_id: str, flow_id: str, fn) -> dict:
        with self._lock:
            doc = self._read(tenant_id, flow_id)
            cat = FlowCatalog.from_dict(doc["catalog"])
            out = fn(cat, doc)
            doc["catalog"] = cat.to_dict()
            doc["flow"]["version"] += 1  # incrementFlowVersion (:701-714)
            self._write(tenant_id, doc)
            return out

    def disable_action(self, tenant_id: str, flow_id: str, key: str) -> None:
        """≙ DisableWorkflowAction (:386-406) + version bump (:400).
        Unknown keys are a silent no-op (UpdateOne matches nothing) —
        quirk mirrored."""

        def fn(cat: FlowCatalog, doc: dict):
            if key in {a.key for a in cat._actions.values()}:
                cat.set_disabled(key, True)

        self._mutate_catalog(tenant_id, flow_id, fn)

    def update_action(
        self,
        tenant_id: str,
        flow_id: str,
        key: str,
        config: dict | None,
        mapper: dict | None,
        meta: dict | None,
    ) -> dict:
        """≙ UpdateAction (:506-556): replace config/map/meta, bump the
        version, return the updated WorkflowAction."""

        def fn(cat: FlowCatalog, doc: dict):
            if key not in cat._actions:
                raise FlowNotFound(f"action {key!r}")
            a = cat.action(key)
            cat._actions[key] = type(a)(
                a.key, a.action_id, config or {}, _mapper_from_json(mapper), a.disabled
            )
            if meta is not None:
                doc.setdefault("action_meta", {})[key] = meta
            return {
                "id": f"{flow_id}/{key}",
                "key": key,
                "tenant_id": tenant_id,
                "workflow_id": flow_id,
                "action_id": a.action_id,
                "config": config or {},
                "map": mapper or {},
                "meta": meta or {},
                "disabled": a.disabled,
            }

        return self._mutate_catalog(tenant_id, flow_id, fn)

    # -- data-plane bridge ---------------------------------------------------
    def catalog(self, tenant_id: str, flow_id: str) -> FlowCatalog:
        """Load a stored definition as a runnable FlowCatalog (≙ the
        workflow engine reading the collections on interpretation,
        workflow.go:129-146)."""
        return FlowCatalog.from_dict(self._read(tenant_id, flow_id)["catalog"])


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

_ROUTES: list[tuple[str, re.Pattern, str]] = [
    ("GET", re.compile(r"^/healthz$"), "healthz"),
    ("GET", re.compile(r"^/tenants/([^/]+)/flows$"), "list_flows"),
    ("GET", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "get_flow"),
    ("POST", re.compile(r"^/tenants/([^/]+)/flows$"), "create_flow"),
    ("PUT", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "update_flow"),
    ("DELETE", re.compile(r"^/tenants/([^/]+)/flows/([^/]+)$"), "delete_flow"),
    (
        "POST",
        re.compile(r"^/tenants/([^/]+)/workflows/([^/]+)/actions/([^/]+)/disable$"),
        "disable_action",
    ),
    (
        "PUT",
        re.compile(r"^/tenants/([^/]+)/workflows/([^/]+)/actions/([^/]+)$"),
        "update_action",
    ),
    ("POST", re.compile(r"^/trigger$"), "webhook_trigger"),
    ("GET", re.compile(r"^/swagger/doc\.json$"), "swagger_doc"),
]


def _openapi_spec() -> dict:
    """The machine-readable API document (≙ the generated swagger served at
    /swagger/*, cmd/workflow/main.go:3-16 + docs/docs.go — ours is OpenAPI
    3.0 built from the live route table, so it cannot drift from it)."""
    mapper = {"type": "object", "additionalProperties": {
        "type": "object",
        "properties": {"mode": {"type": "string", "enum": ["fixed", "key", "expression"]},
                       "value": {"type": "string"}}}}
    action = {"type": "object", "required": ["key", "action_id"], "properties": {
        "key": {"type": "string"}, "action_id": {"type": "string"},
        "config": {"type": "object"}, "mapper": mapper, "meta": {"type": "object"}}}
    peer = {"type": "object", "properties": {
        "parent_key": {"type": "string"}, "meta_output": {"type": "string"},
        "child_key": {"type": "string"}}}
    flow = {"type": "object", "properties": {
        "id": {"type": "string"}, "tenant_id": {"type": "string"},
        "name": {"type": "string"},
        "trigger_type": {"type": "string", "enum": sorted(_VALID_TRIGGER)},
        "meta": {"type": "object"},
        "status": {"type": "string", "enum": sorted(_VALID_STATUS)},
        "version": {"type": "integer"}}}
    tid = {"name": "tenant_id", "in": "path", "required": True,
           "schema": {"type": "string"}}
    fid = {"name": "flow_id", "in": "path", "required": True,
           "schema": {"type": "string"}}
    key = {"name": "key", "in": "path", "required": True,
           "schema": {"type": "string"}}

    def body(schema):
        return {"required": True,
                "content": {"application/json": {"schema": schema}}}

    def resp(schema, code="200"):
        return {code: {"description": "",
                       "content": {"application/json": {"schema": schema}}}}

    create_payload = {"type": "object", "required": ["name"], "properties": {
        "name": {"type": "string"},
        "trigger_type": {"type": "string", "enum": sorted(_VALID_TRIGGER)},
        "meta": {"type": "object"},
        "actions": {"type": "array", "items": action},
        "peers": {"type": "array", "items": peer}}}
    return {
        "openapi": "3.0.3",
        "info": {"title": "Spider Workflow API", "version": "1.0"},
        "paths": {
            "/healthz": {"get": {"responses": {"200": {"description": "ok"}}}},
            "/tenants/{tenant_id}/flows": {
                "get": {"parameters": [
                    tid,
                    {"name": "page", "in": "query", "schema": {"type": "integer", "default": 1}},
                    {"name": "page_size", "in": "query", "schema": {"type": "integer", "default": 20}}],
                    "responses": resp({"type": "object", "properties": {
                        "flows": {"type": "array", "items": flow},
                        "total": {"type": "integer"}, "page": {"type": "integer"},
                        "page_size": {"type": "integer"}}})},
                "post": {"parameters": [tid], "requestBody": body(create_payload),
                         "responses": resp({"type": "object", "properties": {
                             "flow_id": {"type": "string"},
                             "flow_name": {"type": "string"}}})}},
            "/tenants/{tenant_id}/flows/{flow_id}": {
                "get": {"parameters": [tid, fid],
                        "responses": resp({"type": "object", "properties": {
                            "flow_id": {"type": "string"}, "flow_name": {"type": "string"},
                            "tenant_id": {"type": "string"},
                            "actions": {"type": "array", "items": action},
                            "peers": {"type": "array", "items": peer}}})},
                "put": {"parameters": [tid, fid],
                        "requestBody": body({"type": "object", "required": ["name"],
                                             "properties": flow["properties"]}),
                        "responses": resp(flow)},
                "delete": {"parameters": [tid, fid],
                           "responses": {"204": {"description": "deleted"}}}},
            "/tenants/{tenant_id}/workflows/{flow_id}/actions/{key}/disable": {
                "post": {"parameters": [tid, fid, key],
                         "responses": resp({"type": "object"})}},
            "/tenants/{tenant_id}/workflows/{flow_id}/actions/{key}": {
                "put": {"parameters": [tid, fid, key],
                        "requestBody": body({"type": "object", "properties": {
                            "config": {"type": "object"}, "mapper": mapper,
                            "meta": {"type": "object"}}}),
                        "responses": resp(action)}},
            "/trigger": {
                "post": {"requestBody": body({"type": "object",
                                              "required": ["workflow_id"],
                                              "properties": {
                                                  "workflow_id": {"type": "string"},
                                                  "key": {"type": "string"},
                                                  "value": {}}}),
                         "responses": resp({"type": "object", "properties": {
                             "task_id": {"type": "string"},
                             "meta_output": {"type": "string"}}})}},
        },
    }


class ControlPlane:
    """The workflow API service (cmd/workflow/main.go) + the webhook
    trigger service (cmd/webhook-trigger/main.go) on one stdlib HTTP
    server. ``trigger_root`` is the drop-directory root the streaming
    interpreter watches; POST /trigger writes a one-row parquet trigger
    file under ``trigger_root/<workflow_id>/`` (columns
    ``task_id string, value string`` — the value is the JSON-encoded
    payload, ≙ the reference marshalling Values to a JSON string,
    webhook-trigger/main.go:46-58)."""

    def __init__(self, store: FlowStore, trigger_root: str | None = None):
        self.store = store
        self.trigger_root = trigger_root
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._trigger_seq = 0
        self._lock = threading.Lock()

    # -- handlers (named by _ROUTES) ----------------------------------------
    def healthz(self, req, m):
        return 200, {}

    def swagger_doc(self, req, m):
        return 200, _openapi_spec()

    def create_flow(self, req, m):
        tenant_id = m.group(1)
        body = req.json_body()
        if not body.get("name"):
            return 400, {"error": "name is required"}  # apis/flow.go:44-47
        try:
            res = self.store.create_flow(
                tenant_id,
                body["name"],
                body.get("trigger_type", "event"),
                body.get("meta"),
                body.get("actions"),
                body.get("peers"),
            )
        except (KeyError, ValueError) as e:
            return 500, {"error": f"Failed to create flow: {e}"}
        return 200, res

    def list_flows(self, req, m):
        page = req.query_int("page", 1)
        if page < 1:  # apis/flow.go:108-111
            page = 1
        page_size = req.query_int("page_size", 20)
        if page_size < 1 or page_size > 100:  # apis/flow.go:113-117
            page_size = 20
        return 200, self.store.list_flows(m.group(1), page, page_size)

    def get_flow(self, req, m):
        try:
            return 200, self.store.get_flow(m.group(1), m.group(2))
        except FlowNotFound:
            return 404, {"error": "Flow not found"}  # apis/flow.go:156-159

    def update_flow(self, req, m):
        body = req.json_body()
        if not body.get("name"):
            return 400, {"error": "name is required"}  # apis/flow.go:204-207
        try:
            flow = self.store.update_flow(
                m.group(1),
                m.group(2),
                body["name"],
                body.get("trigger_type", "event"),
                body.get("meta"),
                body.get("status", "draft"),
            )
        except (FlowNotFound, ValueError):
            return 500, {"error": "Failed to update flow"}  # apis/flow.go:220-223
        return 200, flow

    def delete_flow(self, req, m):
        self.store.delete_flow(m.group(1), m.group(2))
        return 204, None  # apis/flow.go:255-260 (idempotent)

    def disable_action(self, req, m):
        try:
            self.store.disable_action(m.group(1), m.group(2), m.group(3))
        except FlowNotFound:
            return 500, {"error": "Failed to disable action"}
        return 200, {"status": "disabled"}

    def update_action(self, req, m):
        body = req.json_body()
        try:
            action = self.store.update_action(
                m.group(1),
                m.group(2),
                m.group(3),
                body.get("config"),
                body.get("mapper"),
                body.get("meta"),
            )
        except FlowNotFound:
            return 500, {"error": "Failed to update action"}
        return 200, action

    def webhook_trigger(self, req, m):
        if self.trigger_root is None:
            return 500, {"error": "no trigger root configured"}
        body = req.json_body()
        wid = body.get("workflow_id")
        if not wid or not re.fullmatch(r"[A-Za-z0-9._-]+", wid):
            return 400, {"error": "workflow_id is required"}
        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            self._trigger_seq += 1
            seq = self._trigger_seq
        task_id = f"wh-{seq:06d}"
        table = pa.table(
            {
                "task_id": [task_id],
                "key": [body.get("key", "")],
                # ≙ Values: string(json.Marshal({"value": payload.Value}))
                "value": [json.dumps(body.get("value"), sort_keys=True)],
            }
        )
        tdir = os.path.join(self.trigger_root, wid)
        os.makedirs(tdir, exist_ok=True)
        tmp = os.path.join(tdir, f".{task_id}.parquet.tmp")
        pq.write_table(table, tmp)
        # rename = atomic publish: the file stream never lists a partial file
        os.replace(tmp, os.path.join(tdir, f"{task_id}.parquet"))
        return 200, {"task_id": task_id, "meta_output": "triggered"}

    # -- server lifecycle ----------------------------------------------------
    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Bind and serve on a daemon thread; returns the bound port
        (port=0 picks a free one — tests never race on a fixed port)."""
        plane = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep test output quiet
                pass

            def json_body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    doc = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    return {}
                return doc if isinstance(doc, dict) else {}

            def query_int(self, name: str, default: int) -> int:
                from urllib.parse import parse_qs, urlsplit

                vals = parse_qs(urlsplit(self.path).query).get(name)
                try:
                    return int(vals[0]) if vals else default
                except ValueError:
                    return default

            def _dispatch(self, method: str):
                path = self.path.split("?", 1)[0]
                for verb, pat, name in _ROUTES:
                    if verb != method:
                        continue
                    m = pat.match(path)
                    if m:
                        try:
                            status, payload = getattr(plane, name)(self, m)
                        except Exception as e:  # handler bug → 500, not a hang
                            status, payload = 500, {"error": str(e)}
                        break
                else:
                    status, payload = 404, {"error": "no such route"}
                body = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_PUT(self):
                self._dispatch("PUT")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="flow-control-plane", daemon=True
        )
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
