"""Out-of-process flow workers (plans/flowworker.py — r4 verdict task #4,
≙ /root/reference/pkg/spider/worker.go:39-67's independently-deployed
NATS workers): the fd-order example topology must produce IDENTICAL
deliveries and child task ids whether its worker runs in-process or as a
spawned executable over the parquet work-dir protocol, and killing the
worker mid-flow must recover exactly-once on a same-run_id restart
(committed jobs promoted without re-execution, torn staging discarded)."""

import os
import sys
import textwrap

import pytest

from spider_go_spark.functions.mapper import Mapper
from spider_go_spark.plans.flow import FlowCatalog, FlowRuntime, row_worker
from spider_go_spark.plans.flowworker import SubprocessWorker


def _fd_order(values, config):
    # ≙ cmd/fd-order-worker: one input → ten outputs
    return [("success", {"order_id": f"order@{i + 1}"}) for i in range(10)]


def _fd_catalog():
    return (
        FlowCatalog("orders")
        .add_action("start", "trigger-action")
        .add_action("fd", "fd-order-action",
                    mapper={"value": Mapper("key", "start.output.value")})
        .add_action("sink", "sink-action",
                    mapper={"order_id": Mapper("key", "fd.output.order_id")})
        .add_dep("start", "triggered", "fd")
        .add_dep("fd", "success", "sink")
    )


def _write_worker(path: str, body: str) -> str:
    src = (
        "import sys\n"
        'sys.path.insert(0, "/root/repo")\n'
        "from spider_go_spark.plans.flowworker import run_worker_main\n\n"
        + textwrap.dedent(body)
        + "\nrun_worker_main(handler)\n"
    )
    with open(path, "w") as fh:
        fh.write(src)
    return path


def _trigger_df(spark):
    return spark.createDataFrame(
        [("t1", "go"), ("t2", "go2"), ("t3", "go3")],
        "task_id string, value string",
    )


def _delivery(res, key):
    rows = sorted(
        (r["task_id"], tuple(sorted(r.asDict(recursive=True).get("val", {}).items())))
        for df in res.delivered[key]
        for r in df.collect()
    )
    return rows


def test_subprocess_fd_order_matches_inprocess(spark, tmp_path):
    """Process boundary must be transparent: same deliveries, same
    deterministic child task ids, same leaf behavior as the in-process
    worker — the 'flow gate hashes unchanged' criterion."""
    script = _write_worker(
        str(tmp_path / "fd_worker.py"),
        """
        def handler(values, config):
            return [("success", {"order_id": f"order@{i + 1}"}) for i in range(10)]
        """,
    )
    sub = SubprocessWorker(
        argv=(sys.executable, script),
        output_schema="order_id string",
        workdir=str(tmp_path / "w"),
    )
    res_sub = FlowRuntime(spark, _fd_catalog(), {"fd-order-action": sub}).trigger(
        "start", "triggered", _trigger_df(spark), run_id="r1"
    )
    res_in = FlowRuntime(
        spark,
        _fd_catalog(),
        {"fd-order-action": row_worker(_fd_order, "order_id string")},
    ).trigger("start", "triggered", _trigger_df(spark))

    assert _delivery(res_sub, "sink") == _delivery(res_in, "sink")
    assert len(res_sub.delivered_rows("sink")) == 30
    # the job dir protocol left a committed output and no staging remnants
    job = tmp_path / "w" / "r1" / "fd" / "job-000000"
    assert (job / "output").is_dir() and not (job / "_staging_output").exists()


def test_subprocess_kill_restart_exactly_once(spark, tmp_path):
    """Two-stage subprocess chain; the second worker is killed mid-write
    (torn _staging_output, no commit) on its first execution. The driver
    run fails; re-triggering with the SAME run_id must promote stage-1's
    committed job WITHOUT re-executing it (side-effect count pinned) and
    re-run only stage 2 — final deliveries equal to an uninterrupted
    run's."""
    marks = tmp_path / "marks"
    marks.mkdir()
    w1 = _write_worker(
        str(tmp_path / "w1.py"),
        f"""
        import os
        def handler(values, config):
            open(os.path.join({str(marks)!r}, f"w1-{{os.getpid()}}"), "w").close()
            return [("success", {{"value": values["value"] + "_s1"}})]
        """,
    )
    w2 = _write_worker(
        str(tmp_path / "w2.py"),
        f"""
        import os, sys
        def handler(values, config):
            open(os.path.join({str(marks)!r}, f"w2-{{os.getpid()}}"), "w").close()
            poison = os.path.join({str(marks)!r}, "poison")
            if os.path.exists(poison):
                # simulate a kill mid-write: torn staging dir, no commit
                job_dir = sys.argv[1]
                os.makedirs(os.path.join(job_dir, "_staging_output"), exist_ok=True)
                with open(os.path.join(job_dir, "_staging_output", "part-torn"), "w") as fh:
                    fh.write("garbage")
                os._exit(137)
            return [("success", {{"value": values["value"] + "_s2"}})]
        """,
    )
    cat = (
        FlowCatalog("chain")
        .add_action("start", "trigger-action")
        .add_action("s1", "stage-1",
                    mapper={"value": Mapper("key", "start.output.value")})
        .add_action("s2", "stage-2",
                    mapper={"value": Mapper("key", "s1.output.value")})
        .add_action("sink", "sink-action",
                    mapper={"value": Mapper("key", "s2.output.value")})
        .add_dep("start", "triggered", "s1")
        .add_dep("s1", "success", "s2")
        .add_dep("s2", "success", "sink")
    )
    workers = {
        "stage-1": SubprocessWorker((sys.executable, w1), "value string", str(tmp_path / "wd")),
        "stage-2": SubprocessWorker((sys.executable, w2), "value string", str(tmp_path / "wd")),
    }

    def n_marks(prefix):
        return sum(1 for f in os.listdir(marks) if f.startswith(prefix))

    (marks / "poison").touch()
    rt = FlowRuntime(spark, cat, workers)
    with pytest.raises(RuntimeError, match="exit 137"):
        rt.trigger("start", "triggered", _trigger_df(spark), run_id="r1")
    assert n_marks("w1-") == 1 and n_marks("w2-") == 1
    s2_job = tmp_path / "wd" / "r1" / "s2" / "job-000000"
    assert (s2_job / "_staging_output").is_dir() and not (s2_job / "output").exists()

    (marks / "poison").unlink()
    res = rt.trigger("start", "triggered", _trigger_df(spark), run_id="r1")
    # stage 1's committed job was PROMOTED, not re-executed; stage 2 reran
    assert n_marks("w1-") == 1 and n_marks("w2-") == 2
    assert not (s2_job / "_staging_output").exists() and (s2_job / "output").is_dir()

    clean = FlowRuntime(spark, cat, workers).trigger(
        "start", "triggered", _trigger_df(spark), run_id="r2"
    )
    assert _delivery(res, "sink") == _delivery(clean, "sink")
    vals = sorted(r["value"] for r in res.delivered_rows("sink"))
    assert vals == ["go2_s1_s2", "go3_s1_s2", "go_s1_s2"]


def test_subprocess_zero_emit_batch(spark, tmp_path):
    """A worker that emits nothing for a whole batch must commit a typed
    empty output the driver can read (no column-less parquet)."""
    script = _write_worker(
        str(tmp_path / "drop.py"),
        """
        def handler(values, config):
            return []
        """,
    )
    cat = (
        FlowCatalog("f")
        .add_action("start", "trigger-action")
        .add_action("drop", "drop-action",
                    mapper={"value": Mapper("key", "start.output.value")})
        .add_action("sink", "sink-action")
        .add_dep("start", "triggered", "drop")
        .add_dep("drop", "success", "sink")
    )
    sub = SubprocessWorker((sys.executable, script), "value string", str(tmp_path / "wd"))
    res = FlowRuntime(spark, cat, {"drop-action": sub}).trigger(
        "start", "triggered", _trigger_df(spark), run_id="r1"
    )
    assert res.delivered_rows("sink") == []
