"""Round-state checkpointing: atomic commit + bit-identical resume.

The reference acks messages BEFORE processing them (at-most-once delivery —
/root/reference/pkg/spider/messenger_worker_nats.go:108,
messenger_workflow_nats.go:144,209), so a crash loses in-flight work. This
engine deliberately improves on that (SURVEY.md §2.10): a round either
commits atomically or is fully re-run, giving exactly-once round semantics.

Protocol:
- every engine table commit within round N tags its snapshot,
- after all tables committed, a commit entry (crawl id, round number,
  snapshot id per table, config version, metrics) is written tmp-then-rename
  — that rename is the single atomic commit point (≙ flow Version,
  storage_workflow_mongodb.go:701-715),
- entries carry a global monotonically increasing sequence number: multiple
  crawls (tenants) may share one catalog, interleaving at round granularity
  (single-writer catalog, like the reference's per-flow Version counter),
- resume: roll every table back to the GLOBAL last committed entry's
  snapshots (the most recent consistent state — later partial snapshots of
  ANY crawl are discarded), then continue THIS crawl from its own last
  committed round. Determinism of the round pipeline (strict total orders,
  no wall-clock ids) makes the continued run bit-identical.
- a scoped delete (drop_crawl) commits an ``op: "drop"`` entry so the
  post-delete snapshots become the new restore point and the dropped
  crawl's history no longer resumes.
"""

from __future__ import annotations

import json
import os

from spider_go_spark.tables.snapshot import SnapshotTable

_STATE_DIR = "_round_state"
DEFAULT_CRAWL_ID = "default"


class RoundStateLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, _STATE_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, seq: int) -> str:
        return os.path.join(self.dir, f"commit-{seq:06d}.json")

    def _seqs(self) -> list[int]:
        return sorted(
            int(n[7:-5])
            for n in os.listdir(self.dir)
            if n.startswith("commit-") and n.endswith(".json")
        )

    def entries(self, crawl_id: str | None = None, op: str | None = "round") -> list[dict]:
        """Committed entries in sequence order, optionally filtered to one
        crawl and/or one op kind (``op=None`` → all kinds)."""
        out = []
        for seq in self._seqs():
            with open(self._path(seq)) as f:
                e = json.load(f)
            if crawl_id is not None and e.get("crawl_id", DEFAULT_CRAWL_ID) != crawl_id:
                continue
            if op is not None and e.get("op", "round") != op:
                continue
            out.append(e)
        return out

    def committed_rounds(self, crawl_id: str = DEFAULT_CRAWL_ID) -> list[int]:
        return sorted(e["round"] for e in self.entries(crawl_id))

    def last_round(self, crawl_id: str = DEFAULT_CRAWL_ID) -> int | None:
        rs = self.committed_rounds(crawl_id)
        return rs[-1] if rs else None

    def commit(
        self,
        rnd: int,
        snapshots: dict[str, int],
        config_version: int,
        metrics: dict,
        config_fingerprint: str | None = None,
        crawl_id: str = DEFAULT_CRAWL_ID,
        op: str = "round",
    ) -> None:
        seqs = self._seqs()
        seq = (seqs[-1] + 1) if seqs else 0
        state = {
            "seq": seq,
            "op": op,
            "crawl_id": crawl_id,
            "round": rnd,
            "snapshots": snapshots,
            "config_version": config_version,
            "config_fingerprint": config_fingerprint,
            "metrics": metrics,
        }
        tmp = self._path(seq) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._path(seq))

    def restore(
        self, tables: dict[str, SnapshotTable], crawl_id: str = DEFAULT_CRAWL_ID
    ) -> dict | None:
        """Roll all tables back to the globally last committed entry's
        snapshots (discarding partial later snapshots of any crawl), then
        return THIS crawl's last round entry — or None if this crawl has no
        committed round newer than its last drop (fresh start; the rollback
        still happened)."""
        all_entries = self.entries(op=None)
        if not all_entries:
            return None
        last = all_entries[-1]
        for name, table in tables.items():
            sid = last["snapshots"].get(name)
            if sid is not None:
                table.rollback_to(sid)
        mine = [e for e in all_entries if e.get("crawl_id", DEFAULT_CRAWL_ID) == crawl_id]
        # only rounds after this crawl's last drop count: a non-round entry
        # (e.g. op="maintain") landing after a drop must not resurrect the
        # dropped crawl's earlier rounds
        drops = [i for i, e in enumerate(mine) if e.get("op", "round") == "drop"]
        start = drops[-1] + 1 if drops else 0
        rounds = [e for e in mine[start:] if e.get("op", "round") == "round"]
        return rounds[-1] if rounds else None
