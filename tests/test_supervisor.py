"""Supervisor: stall detection, kill/restart, crash-loop abort.

The supervised child is a tiny python script whose behavior flips on a
state file, standing in for train.py's always-on checkpoint resume: the
first incarnation "wedges" (prints, then sleeps forever), the relaunched
incarnation finds the state file and completes — exactly the recovery
contract the real trainer provides via load_latest.
"""

import json
import sys

from climate2weather_tpu.training.supervisor import (
    SupervisorConfig,
    main,
    supervise,
)

PY = sys.executable


def _cfg(cmd, **kw):
    # Generous margins: CI hosts can be single-core and heavily loaded, so
    # even `python -c print` may take seconds to produce its first line.
    kw.setdefault("stall_timeout", 10.0)
    kw.setdefault("startup_grace", 120.0)
    kw.setdefault("term_grace", 5.0)
    kw.setdefault("restart_delay", 0.1)
    kw.setdefault("max_restarts", 3)
    return SupervisorConfig(cmd=list(cmd), **kw)


def test_clean_exit_passthrough(tmp_path):
    log = tmp_path / "out.log"
    res = supervise(
        _cfg([PY, "-c", "print('Status: tick'); print('done')"], log_path=str(log))
    )
    assert res.exit_code == 0
    assert res.restarts == 0 and res.stalls == 0
    text = log.read_bytes()
    assert b"Status: tick" in text and b"done" in text


def test_stall_is_killed_and_resumed(tmp_path):
    marker = tmp_path / "resumed"
    child = (
        "import pathlib,sys,time\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if m.exists():\n"
        "    print('resumed ok'); sys.exit(0)\n"
        "m.touch()\n"
        "print('Status: tick', flush=True)\n"
        "time.sleep(600)\n"
    )
    journal = tmp_path / "journal.jsonl"
    res = supervise(_cfg([PY, "-c", child], journal_path=str(journal)))
    assert res.exit_code == 0
    assert res.stalls == 1 and res.restarts == 1
    kinds = [json.loads(l)["event"] for l in journal.read_text().splitlines()]
    assert kinds == ["start", "stall", "killed", "start", "exit"]


def test_quiet_startup_not_killed():
    # Silent for longer than stall_timeout, but within startup_grace.
    res = supervise(
        _cfg(
            [PY, "-c", "import time; time.sleep(15); print('up'); exit(0)"],
            stall_timeout=3.0,
        )
    )
    assert res.exit_code == 0 and res.stalls == 0


def test_crash_loop_aborts_with_child_code():
    res = supervise(_cfg([PY, "-c", "raise SystemExit(3)"], max_restarts=2))
    assert res.exit_code == 3
    assert res.restarts == 2  # restarts exhausted, then gave up


def test_cli_requires_command():
    try:
        main(["--stall-timeout", "5"])
    except SystemExit as e:
        assert e.code == 2
    else:
        raise AssertionError("expected argparse error")


def test_sigterm_kills_child_group(tmp_path):
    # Terminating the supervisor must not orphan the (possibly wedged,
    # silent) trainer: the child's pgid is killed on the way out.
    import os
    import signal
    import subprocess
    import time

    pid_file = tmp_path / "child.pid"
    child = (
        "import os,pathlib,time\n"
        f"pathlib.Path({str(pid_file)!r}).write_text(str(os.getpid()))\n"
        "time.sleep(600)\n"  # silent wedge
    )
    sup = subprocess.Popen(
        [
            PY, "-m", "climate2weather_tpu.training.supervisor",
            "--stall-timeout", "300", "--startup-grace", "300",
            "--term-grace", "5",
            "--", PY, "-c", child,
        ]
    )
    deadline = time.time() + 120
    while not pid_file.exists() and time.time() < deadline:
        time.sleep(0.2)
    assert pid_file.exists(), "child never started"
    child_pid = int(pid_file.read_text())
    sup.send_signal(signal.SIGTERM)
    assert sup.wait(timeout=60) == 128 + signal.SIGTERM
    # the child must be gone (kill(pid, 0) raises once it is reaped/zombie's
    # parent -- here init -- has cleaned it up; poll briefly)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            os.kill(child_pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.2)
    else:
        os.kill(child_pid, 9)  # clean up before failing
        raise AssertionError("child survived supervisor SIGTERM")


def test_cli_runs_command(tmp_path):
    journal = tmp_path / "j.jsonl"
    code = main(
        [
            "--stall-timeout", "5",
            "--journal", str(journal),
            "--", PY, "-c", "print('hello')",
        ]
    )
    assert code == 0
    assert journal.exists()


def test_steady_pattern_gates_stall_timeout(tmp_path):
    """With --steady-pattern, non-matching setup lines keep the child under
    startup_grace (a silent post-print compile is not a stall); the first
    matching line arms the steady stall_timeout."""
    # Child: prints a setup line, then is silent for 6 s (> stall_timeout,
    # < startup_grace) before its first Status line -> must NOT be killed.
    child = (
        "import time\n"
        "print('Setting up...', flush=True)\n"
        "time.sleep(6)\n"
        "print('Status: +++ 0', flush=True)\n"
    )
    res = supervise(
        _cfg([PY, "-c", child], stall_timeout=3.0, steady_pattern="Status:")
    )
    assert res.exit_code == 0 and res.stalls == 0

    # After a Status line, a silence > stall_timeout IS a stall.
    child2 = (
        "import time\n"
        "print('Status: +++ 0', flush=True)\n"
        "time.sleep(30)\n"
    )
    res2 = supervise(
        _cfg([PY, "-c", child2], stall_timeout=3.0, max_restarts=0,
             steady_pattern="Status:")
    )
    assert res2.stalls == 1


def test_startup_grace_not_renewed_by_nonmatching_lines(tmp_path):
    """startup_grace is a one-time window from process start: a child that
    never reaches steady state but keeps emitting sporadic non-matching
    lines (each gap < startup_grace) must still be killed once the grace
    window elapses, not kept alive indefinitely."""
    # Emits a non-Status line every 2 s forever; startup_grace=6 s. With the
    # buggy per-line renewal this child would never be killed.
    child = (
        "import time\n"
        "while True:\n"
        "    print('retrying connection...', flush=True)\n"
        "    time.sleep(2)\n"
    )
    journal = tmp_path / "journal.jsonl"
    res = supervise(
        _cfg([PY, "-c", child], stall_timeout=3.0, startup_grace=6.0,
             max_restarts=0, steady_pattern="Status:",
             journal_path=str(journal))
    )
    assert res.stalls == 1
    evt = [json.loads(l) for l in journal.read_text().splitlines()
           if json.loads(l)["event"] == "stall"][0]
    assert evt["steady_seen"] is False and evt["timeout_s"] == 6.0
