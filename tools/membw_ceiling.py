"""Memory-bandwidth ceiling probe — the companion to tools/cpu_ceiling.py.

The pipeline's flat 8→32-core stages (checkpoint read → parquet decode →
join) are STREAMING workloads: they move hundreds of MB per task through
the memory system, unlike cpu_ceiling.py's cache-resident sha256 loop
(which measures only ALU/SMT contention).  On a single-socket VM the
memory controllers saturate long before 32 cores, so a streaming job's
achievable 8→32 speedup is bounded by aggregate bandwidth, not core
count.  This probe measures that bound directly: N processes each
repeatedly reduce a buffer ~8× larger than any LLC (pure reads, numpy —
vectorized C loop, no Python per-element cost), pinned to N cores.

Timing is done INSIDE each child around the sum loop only — interpreter
startup, numpy import, and the buffer allocation/first-touch are all
outside the measured window (a fixed ~0.5 s overhead that would otherwise
dominate the 1-process reading and fake a "flat" curve).  Each child
reports its own streamed-bytes/second; since the children run
concurrently, the machine's aggregate bandwidth at parallelism N is the
sum of per-child rates.

Usage: python tools/membw_ceiling.py [N ...]   (default 1 2 8 32)
Prints one JSON object; pair it with a contemporaneous scaling run the
same way BENCH.md pairs cpu_ceiling readings.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

BUF_MB = 512
PASSES = 8

WORK = f"""
import time
import numpy as np
a = np.ones({BUF_MB} * 1024 * 1024 // 8, dtype=np.float64)
float(a.sum())  # touch once outside the window (faults resolved)
t0 = time.monotonic()
s = 0.0
for _ in range({PASSES}):
    s += float(a.sum())
print(time.monotonic() - t0)
"""


def run(n_procs: int) -> dict:
    cmd_prefix = (
        ["taskset", "-c", f"0-{n_procs - 1}"] if shutil.which("taskset") else []
    )
    procs = [
        subprocess.Popen(
            cmd_prefix + [sys.executable, "-c", WORK],
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
    per_proc_gb = PASSES * BUF_MB / 1024
    agg = sum(per_proc_gb / w for w in walls)
    return {
        "child_walls_sec": [round(w, 2) for w in walls],
        "agg_gb_per_sec": round(agg, 1),
    }


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
