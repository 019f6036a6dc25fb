"""bench.py supervisor-layer tests (the driver gate's highest-stakes path).

The gate contract: `python bench.py` ALWAYS prints exactly one parseable
headline JSON line on stdout, even when the measured child wedges (tunnel
stall), crashes, or can only produce a partial number. `_supervise` runs the
measured bench in a child process, watches child OUTPUT as the liveness
signal, kills+retries on silence past RTCA_BENCH_STALL_S, stashes
null/partial JSON lines so a retry can still land a real number, and falls
back to the stashed/emergency line when every attempt fails
(bench.py:105-230; motivated by BENCH_r02 rc=124 and two wedged round-3 gate
runs — see CLAUDE.md "In-flight dispatch floods wedge the tunnel").

These tests drive the REAL `python bench.py` entry (argparse + supervise
branch) with RTCA_BENCH_SCRIPT pointing at stub children — no jax, no
device; each case runs in a few seconds.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

_GOOD_LINE = json.dumps(
    {
        "metric": "full_duplex_rtf",
        "value": 0.42,
        "unit": "x_realtime",
        "vs_baseline": 2.381,
        "rtf_all": [0.42],
    }
)
_PARTIAL_LINE = json.dumps(
    {
        "metric": "full_duplex_rtf",
        "value": 0.9,
        "unit": "x_realtime (PARTIAL: budget expired during prewarm)",
        "vs_baseline": 1.111,
        "partial": True,
        "rtf_all": [0.9],
    }
)
_PROVISIONAL_LINE = json.dumps(
    {
        "metric": "full_duplex_rtf",
        "value": 0.55,
        "unit": "x_realtime (PROVISIONAL: single short rep after partial "
                "prewarm; lower is better)",
        "vs_baseline": 1.818,
        "provisional": True,
        "rtf_all": [0.55],
    }
)


def _write_stub(tmp_path, body: str) -> str:
    path = os.path.join(str(tmp_path), "stub_bench.py")
    with open(path, "w") as f:
        f.write(
            "import json, os, sys, time\n"
            "GOOD = %r\nPARTIAL = %r\nPROVISIONAL = %r\n"
            % (_GOOD_LINE, _PARTIAL_LINE, _PROVISIONAL_LINE)
            + textwrap.dedent(body)
        )
    return path


def _run_supervised(stub_path, tmp_path, budget="400", stall="30",
                    attempts="2", extra_env=None):
    # stall=30 s, not lower: the liveness clock starts at Popen, so the
    # stub's own interpreter startup counts as silence — with the full test
    # suite saturating the box, a 10 s stall killed healthy children before
    # their first print (interpreter startup alone exceeded it)
    env = dict(
        os.environ,
        RTCA_BENCH_SCRIPT=stub_path,
        RTCA_BENCH_STALL_S=stall,
        # stubs never print the stream-probe mark, so the pre-probe clock
        # must match the stall these tests are written against (the probe
        # clock gets its own test)
        RTCA_BENCH_PROBE_STALL_S=stall,
        RTCA_BENCH_ATTEMPTS=attempts,
        RTCA_TEST_STATE=os.path.join(str(tmp_path), "attempt_count"),
        # the supervisor process itself must not touch any device
        JAX_PLATFORMS="cpu",
    )
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, _BENCH, "--tiny", "--budget", budget],
        capture_output=True, text=True, timeout=120, env=env,
    )
    return proc


def _headline_lines(stdout: str):
    out = []
    for line in stdout.splitlines():
        if line.lstrip().startswith("{"):
            parsed = json.loads(line)
            if parsed.get("metric") == "full_duplex_rtf":
                out.append(parsed)
    return out


def test_good_child_forwards_one_json_line(tmp_path):
    stub = _write_stub(
        tmp_path,
        """
        print("setup[stub]: 0.1s", file=sys.stderr, flush=True)
        print(GOOD, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.42
    assert "partial" not in lines[0]
    assert "attempt 2" not in proc.stderr  # no retry on success


def test_stalled_child_is_killed_and_retry_lands_number(tmp_path):
    # attempt 1 goes silent (a wedged device call); attempt 2 succeeds —
    # the stall kill + fresh-process retry is the whole point of _supervise
    stub = _write_stub(
        tmp_path,
        """
        state = os.environ["RTCA_TEST_STATE"]
        n = int(open(state).read()) if os.path.exists(state) else 0
        open(state, "w").write(str(n + 1))
        if n == 0:
            time.sleep(60)  # silent: no output -> supervisor must kill us
        print(GOOD, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.42
    assert "killing" in proc.stderr
    assert "attempt 2/2" in proc.stderr


def test_probe_clock_kills_unprobed_child_faster(tmp_path):
    # until the child prints the stream-probe completion mark, silence is
    # judged on RTCA_BENCH_PROBE_STALL_S; once the mark is seen, the longer
    # normal stall applies. Attempt 1 never probes and goes silent -> killed
    # on the short clock; attempt 2 probes, then stays silent LONGER than
    # the probe clock but under the normal stall, then lands the number.
    stub = _write_stub(
        tmp_path,
        """
        state = os.environ["RTCA_TEST_STATE"]
        n = int(open(state).read()) if os.path.exists(state) else 0
        open(state, "w").write(str(n + 1))
        if n == 0:
            time.sleep(120)  # never probes: short clock must kill us
        print("setup[stream probe]: 0.1s", file=sys.stderr, flush=True)
        time.sleep(20)  # > probe clock, < normal stall: must survive
        print(GOOD, flush=True)
        """,
    )
    proc = _run_supervised(
        stub, tmp_path, stall="30",
        extra_env={"RTCA_BENCH_PROBE_STALL_S": "12"},
    )
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.42
    assert "stream probe never returned" in proc.stderr
    assert "attempt 2" in proc.stderr


def test_partial_json_is_stashed_not_forwarded_until_attempts_exhaust(tmp_path):
    # a partial line (watchdog fired mid-run) must NOT end the gate early —
    # the retry might land a real number — but must be printed when every
    # attempt fails, so the driver still parses a value
    stub = _write_stub(
        tmp_path,
        """
        print(PARTIAL, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1  # stashed once, not forwarded per attempt
    assert lines[0]["partial"] is True
    assert lines[0]["value"] == 0.9
    assert "attempt 2/2" in proc.stderr  # it DID retry before settling


def test_partial_then_good_prefers_the_real_number(tmp_path):
    stub = _write_stub(
        tmp_path,
        """
        state = os.environ["RTCA_TEST_STATE"]
        n = int(open(state).read()) if os.path.exists(state) else 0
        open(state, "w").write(str(n + 1))
        print(PARTIAL if n == 0 else GOOD, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.42
    assert "partial" not in lines[0]


def test_crashing_child_still_emits_parseable_json(tmp_path):
    stub = _write_stub(
        tmp_path,
        """
        print("boom", file=sys.stderr, flush=True)
        sys.exit(1)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] is None
    assert lines[0]["partial"] is True
    assert "vs_baseline" in lines[0]


def test_child_mode_env_skips_supervise_branch(tmp_path):
    # RTCA_BENCH_CHILD=1 must bypass _supervise (no recursion): with the
    # stub-script override still set, a re-supervising child would print the
    # stub's GOOD line; the real child instead runs main() and, on CPU tiny
    # mode with a tiny budget, the watchdog emits a PARTIAL line itself
    stub = _write_stub(tmp_path, "print(GOOD, flush=True)\n")
    proc = _run_supervised(
        stub, tmp_path, budget="30", extra_env={"RTCA_BENCH_CHILD": "1"},
    )
    lines = _headline_lines(proc.stdout)
    # the watchdog starts before any heavy import, so at least one (possibly
    # partial) headline line is guaranteed within the budget — without this,
    # a crash before any output would pass the stub-line check vacuously
    assert len(lines) >= 1, proc.stderr
    # whatever main() managed within 30 s, the line must NOT be the stub's
    assert all(ln.get("value") != 0.42 for ln in lines)


def test_provisional_is_banked_and_replaced_by_final(tmp_path):
    # the child prints a ladder: provisional first (banked insurance), then
    # the full headline — the supervisor must forward ONLY the final line
    stub = _write_stub(
        tmp_path,
        """
        print(PROVISIONAL, flush=True)
        print(GOOD, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.42
    assert "provisional" not in lines[0]
    assert "attempt 2" not in proc.stderr  # rank-3 line: no retry


def test_provisional_survives_a_later_wedge(tmp_path):
    # the whole point of banking: child prints the provisional then wedges
    # (stage-B compile hangs) — the supervisor must kill it and settle for
    # the provisional instead of retrying into the same wedge or nulling out
    stub = _write_stub(
        tmp_path,
        """
        print(PROVISIONAL, flush=True)
        time.sleep(120)  # silent wedge
        print(GOOD, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.55
    assert lines[0]["provisional"] is True
    assert "settling for the banked candidate" in proc.stderr
    assert "attempt 2" not in proc.stderr


def test_provisional_only_exit_retries_then_keeps_best(tmp_path):
    # a child that exits after only a provisional (watchdog beat stage B)
    # leaves room for a retry to land the full number; if the retry also
    # only manages a provisional, the best provisional is still forwarded
    stub = _write_stub(
        tmp_path,
        """
        print(PROVISIONAL, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    assert "attempt 2/2" in proc.stderr  # it retried for a full number
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.55
    assert lines[0]["provisional"] is True


def test_final_attempt_stall_waits_for_child_watchdog(tmp_path):
    # On the FINAL attempt a stall-kill can only lose information: the
    # child's own budget watchdog (a daemon thread) still prints a partial
    # from a process wedged in a device call, while SIGKILL guarantees
    # silence. Round-4 measured a 553 s first-fetch fee in a degraded
    # window — killing at the stall bound twice produced null where waiting
    # landed a number. The supervisor must wait out silence past the stall
    # bound when no retry is possible.
    stub = _write_stub(
        tmp_path,
        """
        time.sleep(45)  # silent past the 30 s stall bound
        print(PARTIAL, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path, attempts="1")
    assert proc.returncode == 0, proc.stderr
    assert "final attempt" in proc.stderr  # it chose to wait, not kill
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.9  # the late partial landed


def test_later_partial_with_value_replaces_provisional(tmp_path):
    # a watchdog partial that CARRIES a value prints after the banked
    # provisional when the budget expires mid-rep; its median spans every
    # rep measured so far (provisional included, poisoned reps cleaned), so
    # it is the more-informed line and must replace the provisional (live
    # round-4 case: provisional 1.23 from a degraded window, budget expired
    # mid-rep at 0.25 after the window healed — 1.23 was forwarded)
    stub = _write_stub(
        tmp_path,
        """
        print(PROVISIONAL, flush=True)
        print(PARTIAL, flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.9
    assert lines[0]["partial"] is True


def test_valueless_partial_never_outranks_provisional(tmp_path):
    # a null partial (no measured rep) must NOT displace a banked number
    stub = _write_stub(
        tmp_path,
        """
        null_partial = json.loads(PARTIAL)
        null_partial.update(value=None, vs_baseline=None, rtf_all=[])
        print(PROVISIONAL, flush=True)
        print(json.dumps(null_partial), flush=True)
        """,
    )
    proc = _run_supervised(stub, tmp_path)
    assert proc.returncode == 0, proc.stderr
    lines = _headline_lines(proc.stdout)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.55
    assert lines[0]["provisional"] is True
