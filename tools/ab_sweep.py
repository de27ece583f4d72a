"""Clean-A/B adjudication protocol (VERDICT r14 item 6).

The r14 lesson: alternating old/new FORMS inside one JVM shares
JIT/GC/page-cache state between the forms and lets a slow machine
window poison both readings — the minhash kernel call made from such
an A/B ("old 33.9-37.3 s") was contradicted by the same code's clean
sweep (9.5 s).  The trustworthy protocol is alternating fresh
*clean-guard sweeps*: every sweep is its own cold JVM (bench_one),
started only when the machine is idle (external-CPU + loadavg gate,
same thresholds as bench.py), and every sweep times an UNTOUCHED
CONTROL query next to the candidates.  If the control drifts more
than --max-drift (default 15%) across the sweeps, the machine was
bimodal during the experiment and the tool REFUSES a verdict.

Old form = a git ref (default: HEAD), materialized once as a detached
worktree under .ab_old/; new form = the current working tree.

Usage:
    python tools/ab_sweep.py QUERY [QUERY...] \
        [--control tpch_q1] [--sf-dir .bench_sf10] [--reps 2] [-n 3] \
        [--old-ref HEAD] [--max-drift 0.15]

Prints one JSON line: per-query {old, new, speedup} using the best
(min) reading per side across reps, the control trace, and
"verdict": "ok" | "NO VERDICT (control drifted X%)".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKTREE = os.path.join(REPO, ".ab_old")


def ensure_worktree(ref: str) -> str:
    """Materialize ``ref`` as a detached worktree (reused if it already
    points at the same commit)."""
    want = subprocess.run(
        ["git", "rev-parse", ref],
        cwd=REPO, check=True, capture_output=True, text=True,
    ).stdout.strip()
    if os.path.isdir(WORKTREE):
        have = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=WORKTREE, capture_output=True, text=True,
        ).stdout.strip()
        if have == want:
            return WORKTREE
        subprocess.run(
            ["git", "worktree", "remove", "--force", WORKTREE],
            cwd=REPO, check=False, capture_output=True,
        )
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", WORKTREE, want],
        cwd=REPO, check=True, capture_output=True,
    )
    return WORKTREE


def run_sweep(cwd: str, queries: list[str], sf_dir: str, n: int) -> dict:
    """One fresh-JVM clean-guard sweep: wait for idle, then bench_one."""
    from bench import wait_for_external_idle  # repo-root bench guard

    wait_for_external_idle()
    proc = subprocess.run(
        [sys.executable, os.path.join(cwd, "tools", "bench_one.py"),
         *queries, "--sf-dir", os.path.abspath(sf_dir), "-n", str(n),
         "--gc-each"],
        cwd=cwd, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench_one failed in {cwd}: {proc.stderr[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])["timings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--control", default="tpch_q1")
    ap.add_argument("--sf-dir", default=".bench_sf10")
    ap.add_argument("--reps", type=int, default=2,
                    help="alternating old/new sweep pairs")
    ap.add_argument("-n", type=int, default=3, help="min-of-N per sweep")
    ap.add_argument("--old-ref", default="HEAD")
    ap.add_argument("--max-drift", type=float, default=0.15)
    args = ap.parse_args()

    wt = ensure_worktree(args.old_ref)
    names = list(dict.fromkeys([*args.queries, args.control]))
    sweeps: list[dict] = []
    for rep in range(args.reps):
        for side, cwd in (("old", wt), ("new", REPO)):
            t0 = time.monotonic()
            timings = run_sweep(cwd, names, args.sf_dir, args.n)
            sweeps.append({"rep": rep, "side": side, "timings": timings})
            print(
                f"ab_sweep: rep {rep} {side}: "
                + ", ".join(
                    f"{q}={timings[q]['min']}" for q in names
                )
                + f" ({time.monotonic() - t0:.0f}s sweep)",
                file=sys.stderr,
            )

    ctrl = [s["timings"][args.control]["min"] for s in sweeps]
    med = sorted(ctrl)[len(ctrl) // 2]
    drift = max(abs(c - med) / med for c in ctrl)
    verdict = (
        "ok" if drift <= args.max_drift
        else f"NO VERDICT (control drifted {drift * 100:.0f}%)"
    )
    result: dict = {
        "verdict": verdict,
        "control": args.control,
        "control_mins": ctrl,
        "control_drift": round(drift, 4),
        "sf_dir": args.sf_dir,
        "old_ref": args.old_ref,
        "per_query": {},
    }
    for q in args.queries:
        old = min(
            s["timings"][q]["min"] for s in sweeps if s["side"] == "old"
        )
        new = min(
            s["timings"][q]["min"] for s in sweeps if s["side"] == "new"
        )
        result["per_query"][q] = {
            "old": old,
            "new": new,
            "speedup": round(old / new, 3) if new > 0 else None,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
