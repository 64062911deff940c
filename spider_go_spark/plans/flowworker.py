"""Out-of-process flow workers — the reference's main extension point,
re-expressed as a parquet work-dir handoff.

Reference model being reproduced: workers are separate OS processes that
attach to the flow engine over NATS and consume/emit messages for their
``action_id`` (/root/reference/pkg/spider/worker.go:39-67,
bootstrap_worker.go; each example worker runs as its own container —
docker-compose.example-basic.yml). Round 4's ``FlowRuntime`` required
handlers to be Python callables registered in the driver process; this
module restores the process boundary: a :class:`SubprocessWorker` is an
EXECUTABLE the driver spawns per delivery batch, talking through files —
no shared interpreter state, any language that can read/write parquet.

Contract (the work-dir protocol):

- the driver materializes each delivery batch as a parquet directory
  ``<workdir>/<run_id>/<action_key>/job-NNNNNN/input/`` with columns
  ``task_id`` + the action's mapped input fields, plus ``config.json``
  (the action's config dict);
- the worker process is spawned as ``argv + [job_dir]``; it reads
  ``input/`` + ``config.json``, computes its outputs, writes them as
  parquet under ``_staging_output/``, and COMMITS by renaming that
  directory to ``output/`` (os.rename — the atomic commit point, same
  recipe as the index builder's staging promote);
- output rows carry ``task_id``, ``meta_output``, ``emit_idx`` (the
  SendOutput order within a task, made explicit because parquet multi-file
  row order is not a contract) + the declared output value fields;
- the driver waits for exit, requires a committed ``output/``, reads it
  back as a DataFrame, and routes it through the SAME (key, meta_output)
  edge logic as in-process workers — identical child task ids, identical
  context merges, identical hashes.

Exactly-once across kill/restart: job identity is the deterministic
``(run_id, action_key, sequence)`` triple (the interpreter enumerates
batches in a deterministic order, so a re-run of the same trigger under
the same ``run_id`` reproduces the same job numbering). Before spawning,
the driver checks for a committed ``output/`` — present means this job
already ran to completion in a previous attempt and is PROMOTED without
re-executing the worker (no duplicate side effects); absent means any
leftover ``_staging_output/`` is a torn write and is discarded before the
re-run. Killing the worker or the driver at ANY point therefore yields,
on restart, exactly the uninterrupted run's deliveries.

Scale shape: the handoff is parquet directories, so a batch never passes
through driver memory — at 10^7-message hops the worker can itself be a
distributed job (anything that reads a parquet dir); the driver only
orchestrates. Spawn cost is per BATCH, not per message — the ~10 ms
process overhead amortizes over the whole delivery.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from dataclasses import dataclass


@dataclass(frozen=True)
class SubprocessWorker:
    """A worker that runs as a separate OS process per delivery batch.

    ``argv``: executable + leading args (the job directory is appended);
    ``output_schema``: DDL of the output VALUE fields (the contract adds
    task_id/meta_output/emit_idx); ``workdir``: root of the job dirs —
    also the restart handshake, so give each logical run a stable one.
    """

    argv: tuple[str, ...]
    output_schema: str
    workdir: str


def run_job(worker: SubprocessWorker, job_dir: str) -> None:
    """Driver-side execution of one job: promote a committed output if the
    job already ran (exactly-once), else discard any torn staging dir and
    spawn the worker process."""
    out_dir = os.path.join(job_dir, "output")
    if os.path.isdir(out_dir):
        return  # committed by a previous attempt — promote, don't re-run
    shutil.rmtree(os.path.join(job_dir, "_staging_output"), ignore_errors=True)
    proc = subprocess.run(
        [*worker.argv, job_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"flow worker {worker.argv} failed on {job_dir} "
            f"(exit {proc.returncode}): {proc.stderr[-2000:]}"
        )
    if not os.path.isdir(out_dir):
        raise RuntimeError(
            f"flow worker {worker.argv} exited 0 but committed no output/ "
            f"under {job_dir} — the staging rename is the commit point"
        )


def run_worker_main(fn, argv: list[str] | None = None) -> None:
    """Library entry point for PYTHON worker executables (the analog of
    the reference's bootstrap_worker wrapper): a worker script calls
    ``run_worker_main(handler)`` where ``handler(values: dict, config:
    dict) -> list[(meta_output, values_dict)]`` is the reference's exact
    per-message handler shape. Reads the job dir from argv, applies the
    handler per input row, assigns emit_idx in SendOutput order, writes
    ``_staging_output/`` and commits it via rename. Runs entirely in the
    worker process — pyarrow only, no Spark."""
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    args = sys.argv[1:] if argv is None else argv
    (job_dir,) = args
    with open(os.path.join(job_dir, "config.json")) as fh:
        config = json.load(fh)
    in_dir = os.path.join(job_dir, "input")
    table = pa.concat_tables(
        pq.read_table(os.path.join(in_dir, f))
        for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    )
    rows = table.to_pylist()
    out_rows = []
    for rec in rows:
        task_id = rec["task_id"]
        values = {k: v for k, v in rec.items() if k != "task_id"}
        for emit_idx, (meta_output, out) in enumerate(fn(values, config)):
            out_rows.append(
                {
                    "task_id": task_id,
                    "meta_output": meta_output,
                    "emit_idx": emit_idx,
                    **out,
                }
            )
    staging = os.path.join(job_dir, "_staging_output")
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    if out_rows:
        out_table = pa.Table.from_pylist(out_rows)
    else:
        # zero emits: a typed empty frame (the driver's explicit read
        # schema fills the value columns; a column-less parquet would not
        # parse)
        out_table = pa.table(
            {
                "task_id": pa.array([], pa.string()),
                "meta_output": pa.array([], pa.string()),
                "emit_idx": pa.array([], pa.int64()),
            }
        )
    pq.write_table(out_table, os.path.join(staging, "part-00000.parquet"))
    os.rename(staging, os.path.join(job_dir, "output"))  # atomic commit
