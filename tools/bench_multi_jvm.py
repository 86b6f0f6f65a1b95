"""N vs 4N EXECUTORS, emulated the way executors actually exist: as
separate JVMs.

``bench_scaling.py`` emulates 4N executors as one local[4N] JVM — but a
real cluster's 4N executors are 4N independent processes with their own
heaps, GC threads, and shuffle maps.  A single 32-thread JVM conflates
core scaling with single-process artifacts (GC pressure at 32 tasks in
one heap, one scheduler, one shuffle tracker), which is exactly where the
local-mode 8→32 numbers flatten.  This tool measures the executor model
directly:

- baseline ("N executors"): ONE 8-core JVM (taskset 0-7, local[8])
  running the full pipeline on a ~1M-row input slice;
- fleet ("4N executors"): FOUR 8-core JVMs concurrently (taskset 0-7 /
  8-15 / 16-23 / 24-31, local[8] each), each running the full pipeline on
  its OWN disjoint ~1M-row slice.

Weak-scaling efficiency = baseline_wall / max(fleet_walls): four times
the hardware processes four times the data; 1.0 means the fleet finished
its 4× workload in the baseline's wall.  Equivalently aggregate-throughput
ratio / 4.  Slices are disjoint quarters (hash-split) of one 4M-row
deterministic synth input, so per-slice work is statistically equal and
every fleet job is a complete, independent pipeline run — the same
independence a cluster's executor groups have for partition-local stages.

Usage: python tools/bench_multi_jvm.py [total_rows] [--json out.json]
           [--cores N] [--groups G]

``--cores``/``--groups`` pick the executor size and fleet width (default
8×4 = the full-host 8→32 regime).  ``--cores 2 --groups 4`` measures the
2→8 pair executor-style: one 2-core JVM vs four 2-core JVMs — unlike the
single-JVM local[8] emulation, per-executor thread count stays constant
across the two sides, exactly as it does on a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
GROUPS = 4  # overridden by --groups
CORES_PER_GROUP = 8  # overridden by --cores

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

src = sys.argv[1]; out = sys.argv[2]; cpus = int(sys.argv[3])
spark = get_spark("multijvm", master=f"local[{{cpus}}]",
                  extra_conf={{
                      "spark.sql.shuffle.partitions": str(cpus * 2),
                      "spark.local.dir": os.path.join(out, "_sparklocal"),
                  }})
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(src).limit(100).count()  # JVM/codegen warmup
t0 = time.monotonic()
run_pipeline(spark, PipelineConfig(source=src, output_dir=out, resume=False))
wall = time.monotonic() - t0
n = spark.read.parquet(os.path.join(out, "triples")).count()
print(json.dumps({{"wall_sec": wall, "triples": n}}))
"""


def _spawn(slice_dir: str, out: str, core_lo: int) -> subprocess.Popen:
    script = _CHILD.format(repo=REPO)
    cmd = [sys.executable, "-c", script, slice_dir, out, str(CORES_PER_GROUP)]
    if shutil.which("taskset"):
        cmd = [
            "taskset", "-c", f"{core_lo}-{core_lo + CORES_PER_GROUP - 1}",
        ] + cmd
    # stderr to a FILE: concurrent children draining into parent pipes
    # would stall on the ~64KB pipe buffer mid-run (the parent reads them
    # sequentially), silently inflating measured walls
    err = open(os.path.join(os.path.dirname(out) or ".", f"err_{core_lo}.log"), "w")
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=err, text=True)
    p._err_path = err.name
    return p


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=3600)
    if p.returncode != 0:
        tail = open(p._err_path).read()[-2000:] if os.path.exists(p._err_path) else ""
        raise RuntimeError(tail)
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    global GROUPS, CORES_PER_GROUP
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json needs a filename")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    for flag, attr in (("--cores", "CORES_PER_GROUP"), ("--groups", "GROUPS")):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                raise SystemExit(f"{flag} needs a value")
            globals()[attr] = int(argv[i + 1])
            del argv[i : i + 2]
    args = [a for a in argv if a.isdigit()]
    total_rows = int(args[0]) if args else 4_000_000
    work = tempfile.mkdtemp(prefix="multijvm_", dir=WORK_ROOT)
    try:
        gen = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    f"import sys; sys.path.insert(0, {REPO!r})\n"
                    "from pyspark.sql import functions as F\n"
                    "from omop2owl_vocab_spark.session import get_spark\n"
                    "from omop2owl_vocab_spark.sources.synth import synth_code_files\n"
                    "s = get_spark('gen', master='local[32]')\n"
                    f"df = synth_code_files(s, {total_rows})\n"
                    f"df = df.withColumn('g', F.pmod(F.xxhash64('path'), F.lit({GROUPS})))\n"
                    f"for g in range({GROUPS}):\n"
                    f"    df.filter(F.col('g') == g).drop('g').write.mode('overwrite')"
                    f".parquet({work!r} + f'/slice_{{g}}')\n"
                ),
            ],
            capture_output=True, text=True, timeout=1800,
        )
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-2000:])

        # baseline: one 8-core JVM, one slice
        out0 = os.path.join(work, "out_base")
        base = _result(_spawn(os.path.join(work, "slice_0"), out0, 0))
        shutil.rmtree(out0, ignore_errors=True)

        # fleet: four 8-core JVMs, four slices, concurrent
        t0 = time.monotonic()
        procs = [
            _spawn(
                os.path.join(work, f"slice_{g}"),
                os.path.join(work, f"out_{g}"),
                g * CORES_PER_GROUP,
            )
            for g in range(GROUPS)
        ]
        fleet = [_result(p) for p in procs]
        parent_wall = time.monotonic() - t0
        # the scaling metric compares PIPELINE walls on both sides: the
        # baseline wall excludes startup/warmup, so the fleet side must
        # too (max of the child-internal walls); parent_wall (includes
        # 4x startup) is reported for transparency only
        fleet_wall = max(f["wall_sec"] for f in fleet)

        base_thr = base["triples"] / base["wall_sec"]
        agg_triples = sum(f["triples"] for f in fleet)
        agg_thr = agg_triples / fleet_wall
        result = {
            "total_rows": total_rows,
            "groups": GROUPS,
            "cores_per_group": CORES_PER_GROUP,
            f"baseline_1x{CORES_PER_GROUP}": {
                "wall_sec": round(base["wall_sec"], 2),
                "triples": base["triples"],
                "triples_per_sec": round(base_thr, 1),
            },
            f"fleet_{GROUPS}x{CORES_PER_GROUP}": {
                "parent_wall_sec": round(parent_wall, 2),
                "max_child_wall_sec": round(fleet_wall, 2),
                "child_walls_sec": [round(f["wall_sec"], 2) for f in fleet],
                "triples": agg_triples,
                "agg_triples_per_sec": round(agg_thr, 1),
            },
            # 4x hardware, 4x data: 1.0 = fleet finishes its 4x workload
            # in the baseline's wall
            "weak_scaling_efficiency": round(
                base["wall_sec"] / fleet_wall, 3
            ),
            "throughput_ratio_over_groups": round(
                agg_thr / base_thr / GROUPS, 3
            ),
        }
        print(json.dumps(result, indent=1))
        if json_path:
            with open(json_path, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
