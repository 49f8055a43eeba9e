#!/usr/bin/env python
"""One-command 100x full-registry EXACT sweep (r10 verdict #3).

The r10 round ran this by hand for the first time and it caught three
real correctness classes that three rounds of gate-SF sweeps could not
see (DECIMAL-vs-DOUBLE oracle tie-break, sparse-id forest row drop,
.xx5 money boundary) — value-lattice coverage grows with SF, so the
stress tier is a correctness instrument, not just perf telemetry.
This wraps the two manual steps into the round-close ritual:

    python scripts/stress_sweep.py          # whole registry
    python scripts/stress_sweep.py q01 q61  # substring-scoped rerun

1. ensures the 100x tier exists (scripts/stress_tier.py generation,
   idempotent via its .complete marker),
2. runs scripts/driver_check.py --exact against it in a fresh
   interpreter (same isolation the driver's gate has),
3. appends a machine-readable result line to PROGRESS.jsonl, e.g.
   {"ts": ..., "round": N, "stress_sweep": "195/195", "fails": []}.

Exit code is driver_check's: nonzero on any FAIL.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRESS_DIR = os.environ.get("STRESS_DIR", "/tmp/stress_sf1")


def _current_round() -> int | None:
    try:
        with open(os.path.join(REPO, "PROGRESS.jsonl")) as fh:
            last = None
            for line in fh:
                if line.strip():
                    last = line
        return json.loads(last).get("round") if last else None
    except Exception:
        return None


def main() -> int:
    if not os.path.exists(os.path.join(STRESS_DIR, ".complete")):
        print(f"[stress_sweep] generating {STRESS_DIR} ...", flush=True)
        gen = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "stress_tier.py"),
             "--generate-only"],
            cwd=REPO,
        )
        if gen.returncode != 0:
            print("[stress_sweep] generation FAILED", file=sys.stderr)
            return gen.returncode

    args = [sys.executable, os.path.join(REPO, "scripts", "driver_check.py"),
            STRESS_DIR, "--exact", *sys.argv[1:]]
    print(f"[stress_sweep] {' '.join(args)}", flush=True)
    t0 = time.monotonic()
    # stream stdout live (a full sweep runs ~30 min — a silent capture
    # hides progress) while teeing it for the result parse. stderr
    # rides the same pipe (r11 ADVICE #4: DEVNULL meant a crashed
    # sweep recorded "parse-error" with zero diagnostics); the parse
    # regexes below are anchored tightly enough that log noise cannot
    # fake a summary line.
    proc = subprocess.Popen(
        args, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1,
    )
    captured: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        captured.append(line)
    proc.wait()
    out_text = "".join(captured)

    m = re.search(r"(\d+) oracle-match, (\d+) rows-only, (\d+) FAIL", out_text)
    fails = re.findall(r"^  (\S+): FAIL", out_text, flags=re.M)
    record = {
        "ts": time.time(),
        "round": _current_round(),
        "stress_sweep": (
            f"{int(m.group(1)) + int(m.group(2))}/"
            f"{int(m.group(1)) + int(m.group(2)) + int(m.group(3))}"
            if m else "parse-error"
        ),
        "exact": True,
        "scoped": sys.argv[1:] or None,
        "fails": fails,
        "wall_s": round(time.monotonic() - t0, 1),
        "stress_dir": STRESS_DIR,
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(f"[stress_sweep] recorded: {json.dumps(record)}")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
