"""Memory-bandwidth ceiling probe — the companion to tools/cpu_ceiling.py.

The pipeline's flat 8→32-core stages (checkpoint read → parquet decode →
join) are STREAMING workloads: they move hundreds of MB per task through
the memory system, unlike cpu_ceiling.py's cache-resident sha256 loop
(which measures only ALU/SMT contention).  On a single-socket VM the
memory controllers saturate long before 32 cores, so a streaming job's
achievable 8→32 speedup is bounded by aggregate bandwidth, not core
count.  This probe measures that bound directly: N processes each
repeatedly reduce a buffer ~8× larger than any LLC (pure reads, numpy —
vectorized C loop, no Python per-element cost), pinned to N cores; the
aggregate GB/s at each N is the machine's usable bandwidth at that
parallelism, and the N→4N bandwidth ratio is the ceiling any
bandwidth-bound stage can scale by.

Usage: python tools/membw_ceiling.py [N ...]   (default 1 2 8 32)
Prints one JSON object; pair it with a contemporaneous scaling run the
same way BENCH.md pairs cpu_ceiling readings.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time

BUF_MB = 512
PASSES = 8

WORK = f"""
import numpy as np
a = np.ones({BUF_MB} * 1024 * 1024 // 8, dtype=np.float64)
s = 0.0
for _ in range({PASSES}):
    s += float(a.sum())
"""


def run(n_procs: int) -> dict:
    cmd_prefix = (
        ["taskset", "-c", f"0-{n_procs - 1}"] if shutil.which("taskset") else []
    )
    # warm one child (numpy import + page-in) outside the timed window
    subprocess.run(
        cmd_prefix + [sys.executable, "-c", WORK], capture_output=True
    )
    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            cmd_prefix + [sys.executable, "-c", WORK],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(n_procs)
    ]
    for p in procs:
        p.wait()
    wall = time.monotonic() - t0
    total_gb = n_procs * PASSES * BUF_MB / 1024
    return {"wall_sec": round(wall, 2), "agg_gb_per_sec": round(total_gb / wall, 1)}


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {str(n): run(n) for n in levels}
    pairs = {}
    for lo, hi in [(2, 8), (8, 32)]:
        if str(lo) in out and str(hi) in out:
            ratio = out[str(hi)]["agg_gb_per_sec"] / out[str(lo)]["agg_gb_per_sec"]
            pairs[f"{lo}->{hi}"] = {
                "bandwidth_ratio": round(ratio, 2),
                # a perfectly parallel bandwidth-bound stage scales by at
                # most the bandwidth ratio; efficiency = ratio / core-ratio
                "max_efficiency": round(ratio / (hi / lo), 3),
            }
    print(json.dumps({"buf_mb": BUF_MB, "levels": out, "ceilings": pairs}, indent=1))


if __name__ == "__main__":
    main()
