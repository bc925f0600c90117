"""Interleaved A/B of entry timings between two checkouts.

Alternates full `entry_times.py` passes between checkout A and
checkout B (A B A B ... — so box drift hits both variants equally),
N rounds each, and reports the per-entry MIN for each side plus the
ratio.  Each pass is a fresh process with PYTHONPATH pinned to its
checkout (the r16 third-pass trap: a worktree run importing
/root/repo's code silently times the wrong variant).

Usage:
  python tools/ab_entries.py <dirA> <dirB> <sf_dir> <rounds> name...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def run_pass(checkout: str, sf_dir: str, names: list[str]) -> dict:
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ, PYTHONPATH=checkout)
    subprocess.run(
        [
            sys.executable,
            os.path.join(checkout, "tools", "entry_times.py"),
            sf_dir,
            out,
            *names,
        ],
        env=env,
        check=True,
        capture_output=True,
        text=True,
    )
    with open(out) as fh:
        payload = json.load(fh)
    os.unlink(out)
    if payload.get("errors"):
        raise SystemExit(f"errors in {checkout}: {payload['errors']}")
    return payload["times"]


def main() -> None:
    a, b, sf_dir, rounds = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    names = sys.argv[5:]
    mins: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    for i in range(rounds):
        for side, checkout in (("A", a), ("B", b)):
            times = run_pass(checkout, sf_dir, names)
            for n, t in times.items():
                cur = mins[side].get(n)
                mins[side][n] = t if cur is None else min(cur, t)
            print(
                f"round {i} {side}: "
                + " ".join(f"{n}={t:.2f}" for n, t in times.items()),
                flush=True,
            )
    print(f"\n{'entry':<40} {'A(min)':>8} {'B(min)':>8} {'B/A':>6}")
    ta = tb = 0.0
    for n in names:
        va, vb = mins["A"].get(n), mins["B"].get(n)
        if va is None or vb is None:
            continue
        ta += va
        tb += vb
        print(f"{n:<40} {va:8.2f} {vb:8.2f} {vb / va:6.2f}")
    if ta:
        print(f"{'TOTAL':<40} {ta:8.2f} {tb:8.2f} {tb / ta:6.2f}")


if __name__ == "__main__":
    main()
