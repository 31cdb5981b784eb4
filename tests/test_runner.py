"""T6 — unattended logged-run wrapper (reference LoggedRun.fs:10-37,
Program.fs:24-66). Pure-python tests for the wrapper itself, plus one
Spark integration cycle through the real pipeline."""

from __future__ import annotations

import os

from eventanalysis_spark.runner import (
    LOG_CYCLE_BYTES,
    run_logged,
    update_cycle,
    validate_tag,
)


def test_tag_grammar_matches_reference():
    """Program.fs:33 grammar: [A-Za-z][A-Za-z0-9]*([-_.][A-Za-z0-9]+)*"""
    assert validate_tag("event-db-updater")
    assert validate_tag("Job1.cycle_2")
    assert not validate_tag("1starts-with-digit")
    assert not validate_tag("bad..dots")
    assert not validate_tag("trailing-")
    assert not validate_tag("")


def test_log_append_and_header(tmp_path):
    d = str(tmp_path)
    assert run_logged(lambda: (print("hello cycle"), 0)[1], tag="t1", log_dir=d) == 0
    assert run_logged(lambda: (print("second cycle"), 0)[1], tag="t1", log_dir=d) == 0
    body = open(os.path.join(d, "t1.log")).read()
    assert body.count("-----------------------------") == 2  # one header per cycle
    assert "hello cycle" in body and "second cycle" in body


def test_log_cycles_past_size_cap(tmp_path):
    d = str(tmp_path)
    big = "x" * (LOG_CYCLE_BYTES + 1000)
    run_logged(lambda: (print(big), 0)[1], tag="t2", log_dir=d)
    run_logged(lambda: (print("fresh"), 0)[1], tag="t2", log_dir=d)
    logs = sorted(os.listdir(d))
    assert "t2.log" in logs
    rotated = [f for f in logs if f.startswith("t2.") and f != "t2.log"]
    assert len(rotated) == 1  # oversized log moved to timestamped name
    assert big in open(os.path.join(d, rotated[0])).read()
    assert "fresh" in open(os.path.join(d, "t2.log")).read()


def test_exception_logged_and_exit_1(tmp_path):
    d = str(tmp_path)

    def boom() -> int:
        print("partial output")
        raise RuntimeError("cycle exploded")

    assert run_logged(boom, tag="t3", log_dir=d) == 1
    body = open(os.path.join(d, "t3.log")).read()
    assert "partial output" in body  # output before the crash is kept
    assert "------ ERROR -----" in body
    assert "cycle exploded" in body


def test_invalid_tag_warns_and_uses_default(tmp_path):
    d = str(tmp_path)
    assert run_logged(lambda: 0, tag="1bad", log_dir=d) == 0
    body = open(os.path.join(d, "event-db-updater.log")).read()
    assert "Ignoring invalid tag '1bad'" in body


def test_update_cycle_through_pipeline(spark, tmp_path, pages_path):
    """Two scheduled cycles: first drains the source in capped batches,
    second logs increment 0 — and the watermark survives between cycles
    (the resume property the scheduler relies on)."""
    d = str(tmp_path)
    wh = os.path.join(d, "wh")
    rc = run_logged(
        lambda: update_cycle(spark, pages_path, wh, cap=1500, repeat=True),
        tag="cycle", log_dir=d,
    )
    assert rc == 0
    rc2 = run_logged(
        lambda: update_cycle(spark, pages_path, wh, cap=1500, repeat=False),
        tag="cycle", log_dir=d,
    )
    assert rc2 == 0
    body = open(os.path.join(d, "cycle.log")).read()
    assert '"batch": "b000001"' in body
    assert '"increment": 0' in body
