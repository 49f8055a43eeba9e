#!/usr/bin/env python
"""One-command round-close pack (r11 verdict #7).

Runs the five round-close gates in sequence, streams their output
live, and appends ONE machine-readable PROGRESS.jsonl line so the
round's closing evidence is a single reproducible artifact:

    1. fingerprint diff  — the changed-query set must be exactly the
       set fronting ``__spark_entry__._CHANGED_THIS_ROUND`` (the diff
       output is recorded; test_cli enforces the window rule),
    2. pytest tests/     — the full suite,
    3. sf0.01 exact sweep — scripts/driver_check.py --exact,
    4. sf0.1  exact sweep — same, at the bench SF,
    5. 100x stress sweep  — scripts/stress_sweep.py (records its own
       PROGRESS line too, as every round since r11),
    6. bench              — quiet-load-fingerprinted headline record.

Usage:

    python scripts/round_close.py            # everything (~60-75 min)
    python scripts/round_close.py --skip-stress --skip-bench

Exit code: nonzero if any gate fails. Gates run in order and a
failure STOPS the pack (a red suite makes the sweeps meaningless);
the PROGRESS line records how far it got.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str], env: dict | None = None) -> tuple[int, str]:
    """Stream a child's merged output live while teeing it for parse."""
    print(f"[round_close] $ {' '.join(args)}", flush=True)
    proc = subprocess.Popen(
        args,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        bufsize=1,
        env={**os.environ, **(env or {})},
    )
    captured: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        captured.append(line)
    proc.wait()
    return proc.returncode, "".join(captured)


def main() -> int:
    skip_stress = "--skip-stress" in sys.argv
    skip_bench = "--skip-bench" in sys.argv
    py = sys.executable
    t0 = time.monotonic()
    record: dict = {"ts": time.time(), "round_close": {}}
    rc_total = 0

    def gate(name: str, ok: bool, detail) -> None:
        record["round_close"][name] = {"ok": ok, "detail": detail}

    # 1. fingerprint diff — informational + recorded (the window rule
    # itself is enforced by tests/test_cli.py inside gate 2)
    rc, out = _run([py, os.path.join(REPO, "scripts", "fingerprints.py"), "diff"])
    drifted = [
        ln.strip() for ln in out.splitlines() if re.match(r"^\s*q\d+_", ln)
    ]
    gate("fingerprint_diff", rc == 0, {"changed": drifted})
    rc_total |= rc

    # 2. full suite
    rc, out = _run([py, "-m", "pytest", "tests/", "-q"])
    m = re.search(r"(\d+) passed", out)
    f = re.search(r"(\d+) failed", out)
    gate(
        "pytest",
        rc == 0,
        {"passed": int(m.group(1)) if m else None, "failed": int(f.group(1)) if f else 0},
    )
    rc_total |= rc
    if rc != 0:
        return _finish(record, rc_total, t0)

    # 3+4. both-SF exact sweeps (fresh interpreter each — the driver's
    # isolation)
    for sf in ("0.01", "0.1"):
        rc, out = _run(
            [py, os.path.join(REPO, "scripts", "driver_check.py"),
             f"/root/testdata/sf{sf}", "--exact"]
        )
        m = re.search(r"(\d+) oracle-match, (\d+) rows-only, (\d+) FAIL", out)
        fails = re.findall(r"^  (\S+): FAIL", out, flags=re.M)
        gate(
            f"exact_sf{sf}",
            rc == 0,
            {"summary": m.group(0) if m else "parse-error", "fails": fails},
        )
        rc_total |= rc
        if rc != 0:
            return _finish(record, rc_total, t0)

    # 5. 100x stress sweep (appends its own PROGRESS line as well)
    if not skip_stress:
        rc, out = _run([py, os.path.join(REPO, "scripts", "stress_sweep.py")])
        m = re.search(r'"stress_sweep": "([^"]+)"', out)
        gate("stress_sweep", rc == 0, {"summary": m.group(1) if m else "parse-error"})
        rc_total |= rc
        if rc != 0:
            return _finish(record, rc_total, t0)

    # 6. bench — refuse a loud box for the committed record. The
    # pack's own sweep stages leave the 1-min average elevated for a
    # couple of minutes after they exit, so wait for the box to
    # settle first; only a load that persists past the settle window
    # is real co-tenant contention.
    if not skip_bench:
        deadline = time.monotonic() + 15 * 60
        load1 = os.getloadavg()[0]
        while load1 >= 2.0 and time.monotonic() < deadline:
            print(
                f"[round_close] load1 {load1:.2f} >= 2.0 — waiting for "
                "the box to settle before the bench record",
                flush=True,
            )
            time.sleep(30)
            load1 = os.getloadavg()[0]
        if load1 >= 2.0:
            gate("bench", False, {"skipped": f"load1 {load1:.2f} >= 2.0 — rerun quiet"})
            rc_total |= 1
        else:
            rc, out = _run([py, os.path.join(REPO, "bench.py")])
            m = re.search(r'"value": ([0-9.]+)', out)
            gate(
                "bench",
                rc == 0,
                {"headline_s": float(m.group(1)) if m else None, "load1": round(load1, 2)},
            )
            rc_total |= rc

    return _finish(record, rc_total, t0)


def _finish(record: dict, rc: int, t0: float) -> int:
    record["ok"] = rc == 0
    record["wall_s"] = round(time.monotonic() - t0, 1)
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(f"[round_close] recorded: {json.dumps(record)}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
