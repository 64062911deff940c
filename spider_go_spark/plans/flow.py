"""Generic user-defined workflow DAGs — the reference's core product
surface, re-expressed as batched DataFrame hops.

Reference model being reproduced:

- a flow = named actions + labeled edges: ``CreateFlow`` stores actions
  (key, action_id, config, per-field mapper, disabled) and deps
  (parent_key, meta_output, child_key)
  (/root/reference/pkg/spider/usecase/flow.go:47-102,
  storage_workflow_mongodb.go:137-211, action.go:3-14);
- per-action worker handlers registered by ``action_id`` consume input
  messages and emit zero-or-more outputs, each tagged with a
  ``meta_output`` label (worker.go:45-53; multi-emit:
  cmd/fd-order-worker/main.go:31-53; conditional branch:
  cmd/control-flow-worker/main.go:30-45);
- the interpreter routes each output along the edges matching
  (key, meta_output), merges the output into the session context under
  the action's key, evaluates the CHILD's field mappers over that context
  (``ex()``, workflow.go:347-399; nil mapper ⇒ empty input), and delivers
  the mapped record as the child's input (workflow.go:207-316);
- disabled actions drop their messages at consume time
  (workflow.go:100-102,222-224).

Spark-first divergences (SURVEY §1.3 style):

- messages flow in BATCHES: one handler invocation per (action, delivery
  batch) via ``mapInPandas`` (Arrow, vectorized) instead of one goroutine
  per message — at 10^7 messages/hop this is the difference between a
  distributed map stage and an actor storm;
- the session-context store (CreateSessionContext / GetSessionContext
  point reads per task, workflow.go:150,236) is replaced by a context
  STRUCT COLUMN riding along with each message — the context a task needs
  is exactly its own path history, so carrying it beats a point-read
  store at any scale (no lookup join, no store to garbage-collect);
- task ids are deterministic paths ``trigger_task/child#emit`` instead of
  uuidv7 (wall-clock identity is unreproducible; ≙ the (round, rank)
  divergence);
- expression mappers compile ONCE per hop into Catalyst columns
  (functions/mapper.py) instead of expr.Compile per message
  (workflow.go:379-385).

A hop processes every pending delivery batch: handler → label routing →
context merge (``withField``) → child mapper projection → new pending
batches. Per-path context types may differ across parents, so batches
stay separate DataFrames (a union would need a common context schema);
each is one Arrow map stage + codegen projections — no shuffle at all in
a hop unless a handler itself shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_go_spark.functions.mapper import Mapper


@dataclass(frozen=True)
class FlowAction:
    """≙ spider.WorkflowAction (action.go:3-14)."""

    key: str
    action_id: str
    config: dict = field(default_factory=dict)
    # per-FIELD mappers building THIS action's input from the context
    # (storage.go:5-16); None ≙ nil Map ⇒ empty input ({})
    mapper: dict[str, Mapper] | None = None
    disabled: bool = False


@dataclass(frozen=True)
class FlowEdge:
    """≙ a workflow-action dep (storage_workflow_mongodb.go:251-294)."""

    parent_key: str
    meta_output: str
    child_key: str


class FlowCatalog:
    """Actions + labeled edges of one flow (≙ the Mongo workflow_action /
    workflow_action_dep collections behind CreateFlow)."""

    def __init__(self, flow_id: str = "flow"):
        self.flow_id = flow_id
        self._actions: dict[str, FlowAction] = {}
        self._edges: list[FlowEdge] = []

    def add_action(
        self,
        key: str,
        action_id: str,
        config: dict | None = None,
        mapper: dict[str, Mapper] | None = None,
        disabled: bool = False,
    ) -> "FlowCatalog":
        if key in self._actions:
            raise ValueError(f"action key {key!r} already defined")
        self._actions[key] = FlowAction(key, action_id, config or {}, mapper, disabled)
        return self

    def add_dep(self, parent_key: str, meta_output: str, child_key: str) -> "FlowCatalog":
        """≙ storage.AddDep(parent, meta_output, child)."""
        for k in (parent_key, child_key):
            if k not in self._actions:
                raise ValueError(f"unknown action key {k!r} in dep")
        self._edges.append(FlowEdge(parent_key, meta_output, child_key))
        return self

    def set_disabled(self, key: str, disabled: bool = True) -> None:
        a = self._actions[key]
        self._actions[key] = FlowAction(a.key, a.action_id, a.config, a.mapper, disabled)

    def action(self, key: str) -> FlowAction:
        return self._actions[key]

    def deps(self, key: str, meta_output: str) -> list[FlowAction]:
        """≙ QueryWorkflowActionDependencies (exact label match)."""
        return [
            self._actions[e.child_key]
            for e in self._edges
            if e.parent_key == key and e.meta_output == meta_output
        ]

    # -- persistence (≙ CreateFlow storing the definition in Mongo and the
    # workflow engine reloading it on boot,
    # storage_workflow_mongodb.go:137-211) — the definition is tiny
    # control-plane metadata, stored as one JSON document
    def to_dict(self) -> dict:
        return {
            "flow_id": self.flow_id,
            "actions": [
                {
                    "key": a.key,
                    "action_id": a.action_id,
                    "config": a.config,
                    "mapper": (
                        None
                        if a.mapper is None
                        else {
                            name: {"mode": m.mode, "value": m.value}
                            for name, m in sorted(a.mapper.items())
                        }
                    ),
                    "disabled": a.disabled,
                }
                for a in self._actions.values()
            ],
            "edges": [
                {"parent_key": e.parent_key, "meta_output": e.meta_output,
                 "child_key": e.child_key}
                for e in self._edges
            ],
        }

    @classmethod
    def from_dict(cls, doc: dict) -> "FlowCatalog":
        cat = cls(doc["flow_id"])
        for a in doc["actions"]:
            cat.add_action(
                a["key"],
                a["action_id"],
                config=a.get("config") or {},
                mapper=(
                    None
                    if a.get("mapper") is None
                    else {
                        name: Mapper(m["mode"], m["value"])
                        for name, m in a["mapper"].items()
                    }
                ),
                disabled=a.get("disabled", False),
            )
        for e in doc["edges"]:
            cat.add_dep(e["parent_key"], e["meta_output"], e["child_key"])
        return cat

    def save(self, path: str) -> None:
        import json
        import os

        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(self.to_dict(), f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic: readers never see a partial flow

    @classmethod
    def load(cls, path: str) -> "FlowCatalog":
        import json

        with open(path) as f:
            return cls.from_dict(json.load(f))

    # catalog-as-dim-tables: the flow definition is data, queryable like
    # any other table (≙ listing the Mongo collections)
    def actions_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (a.key, a.action_id, a.disabled, sorted(a.config.items()),
             sorted((a.mapper or {}).keys()))
            for a in self._actions.values()
        ]
        return spark.createDataFrame(
            rows,
            "key string, action_id string, disabled boolean, "
            "config array<struct<k:string,v:string>>, mapped_fields array<string>",
        )

    def edges_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(e.parent_key, e.meta_output, e.child_key) for e in self._edges],
            "parent_key string, meta_output string, child_key string",
        )


@dataclass
class Worker:
    """A registered handler for one ``action_id`` (≙ LazyBootstrapWorker,
    bootstrap_worker.go). Vectorized contract: ``handler(pdf, config)``
    receives a pandas batch with ``task_id`` plus the action's mapped
    input fields, and returns rows (``task_id``, ``meta_output``, plus
    the declared output fields) — zero, one, or many rows per input task
    (multi-emit ≙ repeated SendOutput)."""

    handler: Callable[[pd.DataFrame, dict], pd.DataFrame]
    output_schema: str  # DDL of the OUTPUT VALUE fields (no task_id/meta)


def row_worker(fn: Callable[[dict, dict], list[tuple[str, dict]]], output_schema: str) -> Worker:
    """Adapt a per-message handler ``fn(values, config) -> [(meta_output,
    values), ...]`` — the reference's exact handler shape — into the
    vectorized Worker contract. Use for parity fixtures and small glue;
    hot-path workers should be natively vectorized."""
    out_fields = [f.name for f in T._parse_datatype_string(output_schema).fields]

    def handler(pdf: pd.DataFrame, config: dict) -> pd.DataFrame:
        rows = []
        val_cols = [c for c in pdf.columns if c != "task_id"]
        for rec in pdf.to_dict("records"):
            values = {c: rec[c] for c in val_cols}
            for meta_output, out in fn(values, config):
                rows.append(
                    {"task_id": rec["task_id"], "meta_output": meta_output,
                     **{f: out.get(f) for f in out_fields}}
                )
        return pd.DataFrame(rows, columns=["task_id", "meta_output", *out_fields])

    return Worker(handler=handler, output_schema=output_schema)


@dataclass
class FlowRunResult:
    delivered: dict[str, list[DataFrame]]  # action key → input batches
    leaf_outputs: dict[str, list[DataFrame]]  # outputs with no matching edge
    hops: int
    n_dropped_disabled: int

    def delivered_rows(self, key: str) -> list[dict]:
        """Every input VALUE delivered to ``key``, as plain dicts (the
        oracle-comparable projection; empty dict per message for nil-mapper
        children, matching ex(env, nil) = {})."""
        rows: list[dict] = []
        for df in self.delivered.get(key, []):
            if "val" in df.columns:
                rows.extend(
                    r.asDict(recursive=True) for r in df.select("val.*").collect()
                )
            else:
                rows.extend({} for _ in range(df.count()))
        return rows


class FlowRuntime:
    """Interprets a FlowCatalog over registered workers, one DataFrame hop
    at a time. ``workers``: action_id → Worker."""

    def __init__(self, spark: SparkSession, catalog: FlowCatalog, workers: dict[str, Worker]):
        self.spark = spark
        self.catalog = catalog
        self.workers = workers
        # per-(run, action) job sequence for subprocess workers: the
        # interpreter enumerates batches deterministically, so (run_id,
        # action_key, seq) is a stable job identity across a restart —
        # the exactly-once promote key (plans/flowworker.py)
        self._run_id = "run"
        self._job_seq: dict[str, int] = {}

    def _is_parent(self, key: str) -> bool:
        return any(e.parent_key == key for e in self.catalog._edges)

    # -- handler stage ------------------------------------------------------
    def _run_handler(self, action: FlowAction, batch: DataFrame) -> DataFrame:
        """mapInPandas over one delivery batch: flatten the input value
        struct, call the worker, attach the per-task emit index (the
        SendOutput order within a task, used for deterministic child task
        ids)."""
        worker = self.workers[action.action_id]
        from spider_go_spark.plans.flowworker import SubprocessWorker

        if isinstance(worker, SubprocessWorker):
            return self._run_subprocess(action, batch, worker)
        out_struct = T._parse_datatype_string(worker.output_schema)
        out_schema = T.StructType(
            [
                T.StructField("task_id", T.StringType(), False),
                T.StructField("meta_output", T.StringType(), False),
                T.StructField("emit_idx", T.LongType(), False),
                *out_struct.fields,
            ]
        )
        cfg = dict(action.config)
        handler = worker.handler
        out_names = [f.name for f in out_struct.fields]

        def run(batches):
            for pdf in batches:
                out = handler(pdf, cfg)
                if out is None or len(out) == 0:
                    continue
                out = out.copy()
                # emit order within each task = SendOutput order
                out["emit_idx"] = out.groupby("task_id").cumcount()
                yield out[["task_id", "meta_output", "emit_idx", *out_names]]

        flat_cols = ["task_id"]
        if "val" in batch.columns:
            flat_cols.append("val.*")
        return batch.select(*flat_cols).mapInPandas(run, out_schema)

    def _run_subprocess(self, action: "FlowAction", batch: DataFrame, worker) -> DataFrame:
        """Out-of-process handler execution (plans/flowworker.py): write
        the delivery batch to the job's ``input/`` parquet dir, spawn the
        worker executable (or promote an already-committed ``output/``
        from a previous attempt — exactly-once across kill/restart), and
        read the committed output back for the normal routing stage. The
        batch never passes through driver memory."""
        import json
        import os

        from spider_go_spark.plans.flowworker import run_job

        seq = self._job_seq.get(action.key, 0)
        self._job_seq[action.key] = seq + 1
        job_dir = os.path.join(
            worker.workdir, self._run_id, action.key, f"job-{seq:06d}"
        )
        out_dir = os.path.join(job_dir, "output")
        if not os.path.isdir(out_dir):  # not yet committed: (re)stage input
            os.makedirs(job_dir, exist_ok=True)
            flat_cols = ["task_id"]
            if "val" in batch.columns:
                flat_cols.append("val.*")
            batch.select(*flat_cols).write.mode("overwrite").parquet(
                os.path.join(job_dir, "input")
            )
            with open(os.path.join(job_dir, "config.json"), "w") as fh:
                json.dump(action.config, fh, sort_keys=True)
        run_job(worker, job_dir)
        out_struct = T._parse_datatype_string(worker.output_schema)
        out_schema = T.StructType(
            [
                T.StructField("task_id", T.StringType(), False),
                T.StructField("meta_output", T.StringType(), False),
                T.StructField("emit_idx", T.LongType(), False),
                *out_struct.fields,
            ]
        )
        return self.spark.read.schema(out_schema).parquet(out_dir)

    # -- one hop ------------------------------------------------------------
    def _route(
        self, action: FlowAction, batch: DataFrame, outputs: DataFrame
    ) -> tuple[dict[str, list[DataFrame]], list[DataFrame]]:
        """Merge outputs into the context and deliver along matching
        edges; returns (child deliveries, unrouted leaf outputs)."""
        out_fields = [
            f.name for f in outputs.schema.fields
            if f.name not in ("task_id", "meta_output", "emit_idx")
        ]
        joined = outputs.join(batch.select("task_id", "ctx"), "task_id")
        new_ctx = F.col("ctx").withField(
            action.key,
            F.struct(F.struct(*[F.col(f) for f in out_fields]).alias("output")),
        )
        joined = joined.withColumn("ctx", new_ctx)

        labels = sorted(
            {e.meta_output for e in self.catalog._edges if e.parent_key == action.key}
        )
        deliveries: dict[str, list[DataFrame]] = {}
        leaves: list[DataFrame] = []
        matched = F.lit(False)
        for label in labels:
            matched = matched | (F.col("meta_output") == label)
            routed = joined.filter(F.col("meta_output") == label)
            for child in self.catalog.deps(action.key, label):
                deliveries.setdefault(child.key, []).append(
                    self._child_input(child, routed)
                )
        unrouted = joined.filter(~matched)
        leaves.append(unrouted)
        return deliveries, leaves

    def _child_input(self, child: FlowAction, routed: DataFrame) -> DataFrame:
        """ex() over the context: evaluate the child's field mappers with
        the context's action keys exposed as top-level columns, producing
        the child's input value struct (nil mapper ⇒ no value fields,
        matching ex(env, nil) = {})."""
        task_id = F.concat(
            F.col("task_id"), F.lit("/"), F.lit(child.key), F.lit("#"),
            F.col("emit_idx").cast("string"),
        ).alias("task_id")
        if not child.mapper:
            return routed.select(task_id, "ctx")
        from spider_go_spark.functions.mapper import string_paths

        flat = routed.select("task_id", "emit_idx", "ctx", "ctx.*")
        # nested paths included: `a1.output.value` is statically known to
        # be a string, so `+` concat and len() dispatch correctly
        str_cols = string_paths(flat.schema)
        val = F.struct(
            *[
                m.to_column(str_cols).alias(name)
                for name, m in sorted(child.mapper.items())
            ]
        )
        return flat.select(task_id, F.col("ctx"), val.alias("val"))

    # -- trigger + drive loop ----------------------------------------------
    def trigger(
        self,
        key: str,
        meta_output: str,
        values: DataFrame,
        max_hops: int = 25,
        run_id: str = "run",
    ) -> FlowRunResult:
        """≙ a trigger message batch (workflow.go:83-127): ``values``'s
        rows each start one session at action ``key``; the trigger
        action's own handler is NOT run — its values enter the context
        directly and route along (key, meta_output) edges. Row identity:
        a ``task_id`` column if present, else a generated ordinal.

        ``run_id`` names this logical run for subprocess workers: re-call
        trigger with the SAME run_id (and the same values) to resume after
        a crash — committed jobs are promoted, not re-executed. Use a
        fresh run_id for a genuinely new payload."""
        self._run_id = run_id
        self._job_seq = {}
        action = self.catalog.action(key)
        dropped = 0
        if action.disabled:
            return FlowRunResult({}, {}, 0, values.count())
        if "task_id" not in values.columns:
            values = values.withColumn(
                "task_id",
                F.concat(F.lit("t"), F.monotonically_increasing_id().cast("string")),
            )
        out_fields = [f for f in values.columns if f != "task_id"]
        seeded = values.select(
            "task_id",
            F.lit(meta_output).alias("meta_output"),
            F.lit(0).cast("long").alias("emit_idx"),
            *out_fields,
        )
        # context starts as {key: {output: values}, $trigger: <same>} —
        # the "$trigger" alias of workflow.go:128 rides the whole session
        # (set once at trigger time, carried forward like any context key)
        deliveries, leaves = self._route_trigger(action, seeded, out_fields)

        pending: dict[str, list[DataFrame]] = deliveries
        delivered: dict[str, list[DataFrame]] = {
            k: list(v) for k, v in deliveries.items()
        }
        leaf_outputs: dict[str, list[DataFrame]] = {key: leaves} if leaves else {}
        hops = 0
        while pending and hops < max_hops:
            hops += 1
            next_pending: dict[str, list[DataFrame]] = {}
            for k, batches in sorted(pending.items()):
                act = self.catalog.action(k)
                if act.disabled:  # consume-time drop (workflow.go:100-102)
                    dropped += sum(b.count() for b in batches)
                    continue
                if act.action_id not in self.workers:
                    if self._is_parent(k):
                        # a message would silently dead-end mid-DAG —
                        # that is a wiring bug, not a sink
                        raise ValueError(
                            f"action {k!r} ({act.action_id!r}) received a "
                            "message, has outgoing edges, but no registered "
                            "worker"
                        )
                    continue  # terminal sink action with no handler
                for batch in batches:
                    batch = batch.localCheckpoint(eager=True)  # cut lineage
                    outputs = self._run_handler(act, batch)
                    ds, ls = self._route(act, batch, outputs)
                    for ck, cbs in ds.items():
                        next_pending.setdefault(ck, []).extend(cbs)
                        delivered.setdefault(ck, []).extend(cbs)
                    ls = [l for l in ls]
                    if ls:
                        leaf_outputs.setdefault(k, []).extend(ls)
            pending = next_pending
        if pending:
            raise RuntimeError(
                f"flow did not quiesce within {max_hops} hops (cycle?); "
                f"pending actions: {sorted(pending)}"
            )
        return FlowRunResult(delivered, leaf_outputs, hops, dropped)

    def _route_trigger(
        self,
        action: FlowAction,
        seeded: DataFrame,
        out_fields: list[str],
    ) -> tuple[dict[str, list[DataFrame]], list[DataFrame]]:
        """Trigger routing — identical to _route but the 'output' is the
        trigger values themselves and the pre-merge context is empty."""
        trig_val = F.struct(
            F.struct(*[F.col(f) for f in out_fields]).alias("output")
        )
        ctx = F.struct(
            trig_val.alias("$trigger"), trig_val.alias(action.key)
        )
        joined = seeded.withColumn("ctx", ctx)
        labels = sorted(
            {e.meta_output for e in self.catalog._edges if e.parent_key == action.key}
        )
        deliveries: dict[str, list[DataFrame]] = {}
        matched = F.lit(False)
        for label in labels:
            matched = matched | (F.col("meta_output") == label)
            routed = joined.filter(F.col("meta_output") == label)
            for child in self.catalog.deps(action.key, label):
                deliveries.setdefault(child.key, []).append(
                    self._child_input(child, routed)
                )
        leaves = [joined.filter(~matched)]
        return deliveries, leaves
