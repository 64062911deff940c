"""Pure-Python replays of the SCD2 dimension-history build
(queries/temporal.py scd2_event_type_history) and the cluster-capped
diversity sample (queries/curation.py cluster_capped_sample). The driver
gate pins cross-engine value parity vs DuckDB; these pin the semantics
against an independent Python evaluator so a matched Spark/SQL bug can't
hide."""

import math
from collections import defaultdict
from datetime import datetime, timedelta

_EPOCH = datetime(1970, 1, 1)


def _us(d: datetime) -> int:
    # naive NTZ timestamp interpreted as UTC (the engine/oracle convention);
    # timedelta floor-division is exact integer microseconds
    return (d - _EPOCH) // timedelta(microseconds=1)

from spider_go_spark.queries import curation
from spider_go_spark.queries.temporal import scd2_event_type_history
from spider_go_spark.queries.vectorops import PQ_SCALE, SEMDEDUP_K

SF = "/root/testdata/sf0.001"


def test_scd2_matches_python(spark):
    ev = [
        (r["user_id"], r["event_id"], r["event_type"], _us(r["ts"]))
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    ]
    by_user = defaultdict(list)
    for u, eid, et, us in ev:
        by_user[u].append((us, eid, et))
    expect = []
    for u, rows in by_user.items():
        rows.sort()
        runs = []  # (event_type, valid_from_us, n_events)
        for us, _, et in rows:
            if runs and runs[-1][0] == et:
                runs[-1][2] += 1
            else:
                runs.append([et, us, 1])
        for i, (et, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            expect.append((u, et, vf, vt, n, vt is None))
    got = [
        (r["user_id"], r["event_type"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in scd2_event_type_history(spark, SF).collect()
    ]
    assert sorted(got) == sorted(expect)
    # exactly one open (current) interval per user
    cur = defaultdict(int)
    for u, *_, is_cur in got:
        cur[u] += is_cur
    assert all(v == 1 for v in cur.values())


def test_cluster_capped_sample_matches_python(spark):
    vecs = {
        int(r["vec_id"]): (list(r["embedding"]), int(r["label"]))
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    q = {vid: [math.floor(x * PQ_SCALE) for x in emb] for vid, (emb, _) in vecs.items()}
    cents = {vid: q[vid] for vid in vecs if vid < SEMDEDUP_K}
    assign = {}
    for vid, v in q.items():
        best = min(
            (sum((a - b) ** 2 for a, b in zip(v, cv)), cid)
            for cid, cv in cents.items()
        )
        assign[vid] = best[1]
    by_cluster = defaultdict(list)
    for vid, cid in assign.items():
        pri = vid * curation.CCS_MULT % curation.CCS_MOD
        by_cluster[cid].append((pri, vid))
    expect = set()
    for cid, members in by_cluster.items():
        for pri, vid in sorted(members)[: curation.CCS_CAP]:
            expect.add((cid, vid, vecs[vid][1], pri))
    got = {
        (r["cluster_id"], r["vec_id"], r["label"], r["priority"])
        for r in curation.cluster_capped_sample(spark, SF).collect()
    }
    assert got == expect
    # the cap is a cap
    per = defaultdict(int)
    for cid, *_ in got:
        per[cid] += 1
    assert all(v <= curation.CCS_CAP for v in per.values())
