"""Measure this machine's parallel-scaling ceiling, independent of Spark.

Runs a fixed per-process CPU workload (sha256 loop) pinned to N cores with
N processes, for N in the requested list, and prints per-core relative
throughput + the max achievable N→4N efficiency for perfectly parallel
work.  Justifies the core-pair choice in tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time

WORK = """
import hashlib, sys
for i in range(int(sys.argv[1])):
    hashlib.sha256(str(i).encode()).digest()
"""


def run(n_procs: int, per_proc: int = 3_000_000) -> float:
    """Wall seconds for n_procs processes × per_proc hashes on n_procs cores."""
    cmd_prefix = (
        ["taskset", "-c", f"0-{n_procs - 1}"] if shutil.which("taskset") else []
    )
    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            cmd_prefix + [sys.executable, "-c", WORK, str(per_proc)]
        )
        for _ in range(n_procs)
    ]
    for p in procs:
        p.wait()
    return time.monotonic() - t0


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    base = None
    for n in levels:
        wall = run(n)
        per_core = 1.0 / wall  # same per-proc work → throughput ∝ 1/wall
        if base is None:
            base = per_core
        out[str(n)] = {
            "wall_sec": round(wall, 2),
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
