"""Measure this machine's parallel-scaling ceiling, independent of Spark.

Runs a fixed per-process CPU workload (sha256 loop) pinned to N cores with
N processes, for N in the requested list, and prints per-core relative
throughput + the max achievable N→4N efficiency for perfectly parallel
work.  Justifies the core-pair choice in tools/bench_scaling.py.

Timing is INSIDE each child around the hash loop only — interpreter
startup/teardown (~0.5 s) is outside the window, so the 1-process reading
isn't inflated by fixed overhead relative to the longer-wall fleet runs
(the same correction tools/membw_ceiling.py applies; the uncorrected form
understated high-N ceilings).  Per-core throughput at parallelism N is
the mean of the N children's own rates.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

WORK = """
import hashlib, sys, time
n = int(sys.argv[1])
t0 = time.monotonic()
for i in range(n):
    hashlib.sha256(str(i).encode()).digest()
print(time.monotonic() - t0)
"""


def run(n_procs: int, per_proc: int = 3_000_000) -> float:
    """Mean per-child hash rate (hashes/sec) for n_procs concurrent
    children pinned to n_procs cores, each timing its own loop."""
    cmd_prefix = (
        ["taskset", "-c", f"0-{n_procs - 1}"] if shutil.which("taskset") else []
    )
    procs = [
        subprocess.Popen(
            cmd_prefix + [sys.executable, "-c", WORK, str(per_proc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for _ in range(n_procs)
    ]
    walls = []
    for p in procs:
        out, _ = p.communicate()
        walls.append(float(out.strip().splitlines()[-1]))
    return sum(per_proc / w for w in walls) / n_procs


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    base = None
    for n in levels:
        per_core = run(n)
        if base is None:
            base = per_core
        out[str(n)] = {
            "per_core_hashes_per_sec": round(per_core),
            "per_core_rel": round(per_core / base, 3),
        }
    pairs = {}
    for lo, hi in [(2, 8), (8, 32)]:
        if str(lo) in out and str(hi) in out:
            speedup = (hi * out[str(hi)]["per_core_rel"]) / (
                lo * out[str(lo)]["per_core_rel"]
            )
            pairs[f"{lo}->{hi}"] = {
                "max_speedup": round(speedup, 2),
                "max_efficiency": round(speedup / (hi / lo), 3),
            }
    print(json.dumps({"levels": out, "ceilings": pairs}, indent=1))


if __name__ == "__main__":
    main()
