"""T6 — unattended scheduled run with rotating logfile.

Parity target: the reference's `event_db_updater` wrapper
(LoggedRun.fs:10-37, Program.fs:24-66): an external scheduler (cron /
Task Scheduler / Airflow) invokes one cycle; the wrapper

  - validates the run tag against the job-name grammar,
  - cycles `{tag}.log` to `{tag}.{yyyyMMdd-HHmmss}.log` when it has
    grown past the size cap (reference: 40 000 bytes),
  - appends a separator + timestamp header per cycle,
  - redirects the run's stdout into the logfile,
  - catches any exception into an `------ ERROR -----` section and
    returns exit code 1 instead of crashing the scheduler slot.

Spark-first notes: the *driver* process is what the scheduler runs, so
plain-file rotation on the driver is the right analog (executor logs
belong to the cluster manager). The run itself is the resumable
pipeline — a crashed cycle leaves the watermark at the last committed
batch and the next scheduled cycle continues from there (T1/T4)."""

from __future__ import annotations

import contextlib
import os
import re
import time
import traceback
from typing import Callable

# reference LoggedRun.fs:14 — cycle when the existing log exceeds this
LOG_CYCLE_BYTES = 40_000
# reference Program.fs:33 tag grammar
_TAG_RE = re.compile(r"^([A-Za-z][A-Za-z0-9]*)([-_.][A-Za-z0-9]+)*$")


def validate_tag(tag: str) -> bool:
    return bool(_TAG_RE.match(tag))


def _cycle_log(path: str, cycle_bytes: int) -> str | None:
    """Rename an oversized log to a timestamped sibling (LoggedRun.fs:14-18).
    Returns the rotated-to path, or None if no rotation happened."""
    try:
        st = os.stat(path)
    except FileNotFoundError:
        return None
    if st.st_size <= cycle_bytes:
        return None
    stamp = time.strftime("%Y%m%d-%H%M%S", time.localtime(st.st_mtime))
    base, ext = os.path.splitext(path)
    target = f"{base}.{stamp}{ext}"
    n = 1
    while os.path.exists(target):  # same-second rotations must not clobber
        target = f"{base}.{stamp}-{n}{ext}"
        n += 1
    os.replace(path, target)
    return target


def run_logged(
    fn: Callable[[], int],
    tag: str = "event-db-updater",
    log_dir: str = ".",
    cycle_bytes: int = LOG_CYCLE_BYTES,
) -> int:
    """Run `fn` with stdout captured into `{log_dir}/{tag}.log`.

    Invalid tags fall back to the default tag with a logged warning
    (reference preparse: an invalid -tag is a warning, not a failure).
    Exceptions inside `fn` are written to the log and become exit 1."""
    warnings: list[str] = []
    if not validate_tag(tag):
        warnings.append(f"Ignoring invalid tag '{tag}'")
        tag = "event-db-updater"
    os.makedirs(log_dir, exist_ok=True)
    logpath = os.path.join(log_dir, f"{tag}.log")
    _cycle_log(logpath, cycle_bytes)
    # line-buffered append + direct redirect: output reaches the logfile AS
    # IT IS PRODUCED (the reference wrapper streams too, LoggedRun.fs:24-30)
    # — a cycle killed mid-run (OOM, scheduler timeout, SIGKILL) keeps
    # everything written so far instead of losing the whole buffered cycle.
    # stderr is captured alongside stdout (tracebacks, JVM warnings).
    with open(logpath, "a", encoding="utf-8", buffering=1) as lf:
        lf.write("---------------------------------------------------------\n")
        lf.write("--- " + time.strftime("%Y-%m-%d %H:%M:%S %z") + "\n")
        for w in warnings:
            lf.write(f"- {w}\n")
        try:
            with contextlib.redirect_stdout(lf), contextlib.redirect_stderr(lf):
                ret = fn()
        except Exception:
            lf.write("\n------ ERROR -----\n")
            lf.write(traceback.format_exc())
            return 1
        lf.write("\n")
    return ret


def update_cycle(
    spark,
    source_path: str,
    warehouse: str,
    cap: int | None = 20000,
    repeat: bool = False,
    period: str = "day",
) -> int:
    """One scheduled update cycle: the reference's AppUpdate.run analog.
    Prints one JSON line per batch (captured into the rotating log)."""
    import json

    from eventanalysis_spark.pipeline import Pipeline, PipelineConfig

    pipe = Pipeline(
        spark, PipelineConfig(warehouse=warehouse, cap=cap, period=period)
    )
    src = spark.read.parquet(source_path)
    results = (
        pipe.run_until_exhausted(src)
        if repeat
        else [r for r in [pipe.run_batch(src)] if r is not None]
    )
    for r in results:
        print(
            json.dumps(
                {
                    "batch": r.batch_id,
                    "n_input": r.n_input,
                    "n_routed": r.n_routed,
                    "sinks": r.sink_counts,
                    "docs_per_sec": round(r.docs_per_sec, 1),
                }
            )
        )
    if not results:
        print(json.dumps({"increment": 0}))
    return 0
