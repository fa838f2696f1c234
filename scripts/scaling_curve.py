"""Full scaling curve: the same assign job at 2/4/8/16/32 cores.

Complements scaling_protocol.py (the N vs 4N gate): a curve shows WHERE
scaling stops being linear on this host — near-ideal in the unsaturated
regime, then the shared-kernel/SMT-free-but-noisy-VM ceiling — which a
single (N, 4N) pair cannot distinguish from an engine bottleneck.
Canary-timed like the protocol; each level runs in its own JVM,
interleaved within a round so weather is common-mode.

Writes a table to BENCH/BASELINE.md + raw json to BENCH/.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_protocol import TRIAL_CODE, canary_seconds  # noqa: E402


def run_trial(cpus: int, cache: str, workload: str) -> tuple[float, float]:
    """→ (wall seconds, CPU seconds of the whole trial process tree).

    Constant CPU-seconds across core counts proves the engine performs
    the same total work at every level (no serialization/overhead);
    wall-clock then divides by however many cores the host actually
    delivers."""
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    p = subprocess.run(
        [sys.executable, "-c", TRIAL_CODE, f"local[{cpus}]", str(cpus), cache, workload],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(json.loads(line[7:])["sec"]), cpu
    raise RuntimeError(p.stderr[-2000:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--levels", default="2,4,8,16,32")
    ap.add_argument("--workload", choices=["text", "cells"], default="cells")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    cache = os.path.join(REPO, ".bench_cache", f"pages_{args.rows}")

    times: dict[int, list[float]] = {c: [] for c in levels}
    cpus_used: dict[int, list[float]] = {c: [] for c in levels}
    canaries = []
    for rnd in range(args.rounds):
        for c in levels:
            canaries.append(canary_seconds())
            wall, cpu = run_trial(c, cache, args.workload)
            times[c].append(wall)
            cpus_used[c].append(cpu)
            print(
                f"round {rnd} local[{c}]: {wall:.1f}s wall, {cpu:.0f}s cpu "
                f"(canary {canaries[-1]:.2f})",
                flush=True,
            )
    floor = min(canaries)

    lines = [
        "",
        f"## Scaling curve ({args.workload} workload, {args.rows:,} rows, "
        f"median of {args.rounds} interleaved rounds; canary floor {floor:.2f}s)",
        "",
        "| cores | median s | best s | rows/s (best) | speedup (best) | per-core eff | cpu-s (min) |",
        "|---|---|---|---|---|---|---|",
    ]
    base = min(times[levels[0]])
    for c in levels:
        med = statistics.median(times[c])
        best = min(times[c])
        lines.append(
            f"| {c} | {med:.1f} | {best:.1f} | {args.rows / best:,.0f} "
            f"| {base / best:.2f}× | {(base / best) / (c / levels[0]):.2f} "
            f"| {min(cpus_used[c]):.0f} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    with open(
        os.path.join(REPO, "BENCH", f"scaling_curve_{args.workload}.json"), "w"
    ) as f:
        json.dump({"times": times, "cpu_s": cpus_used, "canaries": canaries,
                   "rows": args.rows}, f)
    print(json.dumps({c: min(t) for c, t in times.items()}))


if __name__ == "__main__":
    main()
