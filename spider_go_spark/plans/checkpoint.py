"""Round-state checkpointing: atomic commit + bit-identical resume.

The reference acks messages BEFORE processing them (at-most-once delivery —
/root/reference/pkg/spider/messenger_worker_nats.go:108,
messenger_workflow_nats.go:144,209), so a crash loses in-flight work. This
engine deliberately improves on that (SURVEY.md §2.10): a round either
commits atomically or is fully re-run, giving exactly-once round semantics.

Protocol:
- every engine table commit within round N tags its snapshot,
- after all tables committed, a ``round_state`` JSON (round number, snapshot
  id per table, config version, metrics) is written tmp-then-rename — that
  rename is the single atomic commit point (≙ flow Version,
  storage_workflow_mongodb.go:701-715),
- resume: read the highest committed round_state, roll every table back to
  its recorded snapshot (discarding partial later snapshots), continue.
  Determinism of the round pipeline (strict total orders, no wall-clock ids)
  makes the continued run bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import json
import os

from spider_go_spark.tables.snapshot import SnapshotTable

_STATE_DIR = "_round_state"


class RoundStateLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, _STATE_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round-{rnd:06d}.json")

    def committed_rounds(self) -> list[int]:
        return sorted(
            int(n[6:-5])
            for n in os.listdir(self.dir)
            if n.startswith("round-") and n.endswith(".json")
        )

    def last_round(self) -> int | None:
        rs = self.committed_rounds()
        return rs[-1] if rs else None

    def commit(
        self,
        rnd: int,
        snapshots: dict[str, int],
        config_version: int,
        metrics: dict,
        config_fingerprint: str | None = None,
    ) -> None:
        state = {
            "round": rnd,
            "snapshots": snapshots,
            "config_version": config_version,
            "config_fingerprint": config_fingerprint,
            "metrics": metrics,
        }
        tmp = self._path(rnd) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._path(rnd))

    def read(self, rnd: int) -> dict:
        with open(self._path(rnd)) as f:
            return json.load(f)

    def restore(self, tables: dict[str, SnapshotTable]) -> dict | None:
        """Roll all tables back to the last committed round's snapshots.
        Returns that round's state dict, or None if nothing committed yet."""
        last = self.last_round()
        if last is None:
            return None
        state = self.read(last)
        for name, table in tables.items():
            sid = state["snapshots"].get(name)
            if sid is not None:
                table.rollback_to(sid)
        return state
