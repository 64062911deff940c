"""Pure-Python oracle of the reference's workflow interpreter semantics
(workflow.go:83-316): per-message routing, context accumulation, child
mapper application, disabled drops, multi-emit fan-out. Single-threaded
dicts — any divergence the flow tests catch is in the Spark interpreter's
plumbing (mapInPandas batching, struct context merging, label routing),
not in incidental reimplementation drift.

Handlers here are the reference's exact per-message shape
``fn(values, config) -> [(meta_output, values), ...]``; mappers are plain
Python callables ``fn(ctx) -> value`` (the Catalyst mapper dialect itself
is gated separately by tests/test_mapper.py against expected values, so
the flow parity fixtures pass semantically-equal (Mapper spec, python
callable) pairs)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class OracleFlow:
    actions: dict[str, dict] = field(default_factory=dict)
    edges: list[tuple[str, str, str]] = field(default_factory=list)

    def add_action(
        self,
        key: str,
        action_id: str,
        config: dict | None = None,
        mapper: dict[str, Callable[[dict], object]] | None = None,
        disabled: bool = False,
    ) -> "OracleFlow":
        self.actions[key] = {
            "action_id": action_id, "config": config or {},
            "mapper": mapper, "disabled": disabled,
        }
        return self

    def add_dep(self, parent: str, meta_output: str, child: str) -> "OracleFlow":
        self.edges.append((parent, meta_output, child))
        return self

    def deps(self, key: str, meta_output: str) -> list[str]:
        return [c for p, m, c in self.edges if p == key and m == meta_output]


def flow_oracle(
    flow: OracleFlow,
    workers: dict[str, Callable[[dict, dict], list[tuple[str, dict]]]],
    trigger_key: str,
    trigger_meta: str,
    trigger_values: list[dict],
    max_hops: int = 25,
) -> dict[str, list[dict]]:
    """→ delivered input values per action key (insertion-ordered). Each
    trigger value starts one session; routing/context semantics mirror
    workflow.go exactly (ex(env, nil) = {}; disabled drops at consume)."""
    delivered: dict[str, list[dict]] = {}
    if flow.actions[trigger_key]["disabled"]:
        return delivered
    # pending message: (key, values, ctx)
    pending: list[tuple[str, dict, dict]] = []

    def route(key: str, meta_output: str, out_values: dict, ctx: dict) -> None:
        new_ctx = dict(ctx)
        new_ctx[key] = {"output": dict(out_values)}
        for child_key in flow.deps(key, meta_output):
            child = flow.actions[child_key]
            mapper = child["mapper"]
            values = (
                {} if not mapper else {f: fn(new_ctx) for f, fn in mapper.items()}
            )
            delivered.setdefault(child_key, []).append(dict(values))
            pending.append((child_key, values, new_ctx))

    for v in trigger_values:
        # "$trigger" alias (workflow.go:128): set once at trigger time,
        # carried through the whole session like any other context key
        route(trigger_key, trigger_meta, v, {"$trigger": {"output": dict(v)}})

    for _hop in range(max_hops):
        if not pending:
            break
        batch, pending = pending, []
        for key, values, ctx in batch:
            act = flow.actions[key]
            if act["disabled"]:
                continue
            worker = workers.get(act["action_id"])
            if worker is None:
                continue  # terminal sink
            for meta_output, out in worker(dict(values), dict(act["config"])):
                route(key, meta_output, out, ctx)
    if pending:
        raise RuntimeError("flow oracle did not quiesce")
    return delivered
