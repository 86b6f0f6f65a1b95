"""Interleaved same-window N→4N scaling frontier (r3 verdict #1).

Round 3 left one number unmet: raw 2→8-core scaling efficiency 0.68–0.72
vs the ≥0.8 target, with forensics pointing at JVM thread count × the
hypervisor's virtualized timers rather than the job.  This tool sweeps
the candidate mitigations the fleet probes suggested — GC choice
(ParallelGC vs SerialGC), trimmed JVM sizing (``-XX:ActiveProcessorCount``
/ capped GC + JIT threads), and reduced shuffle partitions at the low
leg — in ONE window with the low/high legs of every (config, rep) pair
adjacent, so host drift cannot masquerade as a config effect.

Each leg is a fresh taskset-pinned JVM running the full pipeline on the
SAME pre-generated input (tmpfs), identical to tools/bench_scaling.py
measurement rules.  A sha256-fleet ceiling probe (tools/cpu_ceiling.py
machinery) runs at the start and end of the window so every efficiency
can be read against the same-window embarrassingly-parallel bound.

Usage:
  python tools/bench_scaling_frontier.py [--rows 4000000] [--reps 2]
      [--lo 2] [--hi 8] [--configs a,b,...] [--json OUT.json]
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
sys.path.insert(0, os.path.join(REPO, "tools"))
WORK_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

from cpu_ceiling import run as ceiling_run  # noqa: E402

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

cpus = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
sp = int(sys.argv[4])
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  extra_conf={{
                      "spark.sql.shuffle.partitions": str(sp),
                      "spark.local.dir": os.path.join(out, "_sparklocal"),
                  }})
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(src).limit(100).count()  # JVM/codegen warm
t0 = time.monotonic()
run_pipeline(spark, PipelineConfig(source=src, output_dir=out, resume=False))
wall = time.monotonic() - t0
n = spark.read.parquet(os.path.join(out, "triples")).count()
print(json.dumps({{"cpus": cpus, "wall_sec": wall, "triples": n}}))
"""

# java_opts templates — {cpus} substituted per leg.  taskset already caps
# Runtime.availableProcessors on modern JVMs; ActiveProcessorCount makes
# the trim explicit and pins ergonomics (GC/JIT thread counts) to the leg.
CONFIGS: dict[str, dict] = {
    "parallelgc": {"java": "-XX:+UseParallelGC", "sp_mult": 2},
    "parallelgc_trim": {
        "java": (
            "-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus} "
            "-XX:ParallelGCThreads={cpus} -XX:CICompilerCount=2"
        ),
        "sp_mult": 2,
    },
    "serialgc": {"java": "-XX:+UseSerialGC", "sp_mult": 2},
    "serialgc_trim": {
        "java": (
            "-XX:+UseSerialGC -XX:ActiveProcessorCount={cpus} "
            "-XX:CICompilerCount=2"
        ),
        "sp_mult": 2,
    },
    # shuffle partitions = cores (not 2×): fewer, larger tasks at the low
    # leg — less per-task scheduling overhead where the driver is busiest
    "parallelgc_trim_sp1": {
        "java": (
            "-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus} "
            "-XX:ParallelGCThreads={cpus} -XX:CICompilerCount=2"
        ),
        "sp_mult": 1,
    },
}


def run_leg(cpus: int, src: str, java_opts: str, sp: int) -> dict:
    out = tempfile.mkdtemp(prefix=f"frontier_{cpus}_", dir=WORK_ROOT)
    env = dict(os.environ, SPARK_GRAFT_JAVA_OPTS=java_opts.format(cpus=cpus))
    try:
        cmd = [sys.executable, "-c", _CHILD.format(repo=REPO),
               str(cpus), src, out, str(sp)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, env=env
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        return json.loads(proc.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def ceiling_pair(lo: int, hi: int) -> float:
    per_lo = ceiling_run(lo)
    per_hi = ceiling_run(hi)
    return round((hi * per_hi) / (lo * per_lo) / (hi / lo), 3)


def main() -> None:
    def arg(name: str, default):
        if name in sys.argv:
            i = sys.argv.index(name)
            if i + 1 >= len(sys.argv):
                raise SystemExit(f"{name} needs a value")
            return type(default)(sys.argv[i + 1])
        return default

    rows = arg("--rows", 4_000_000)
    reps = arg("--reps", 2)
    lo = arg("--lo", 2)
    hi = arg("--hi", 8)
    names = arg("--configs", ",".join(CONFIGS)).split(",")
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:  # fail BEFORE the multi-minute gen + ceiling probe
        raise SystemExit(
            f"unknown config(s) {unknown}; valid: {', '.join(CONFIGS)}"
        )
    out_path = arg("--json", "")

    work = tempfile.mkdtemp(prefix="frontier_src_", dir=WORK_ROOT)
    result: dict = {
        "rows": rows, "lo": lo, "hi": hi, "reps": reps,
        "started_unix": time.time(),
    }
    try:
        gen = subprocess.run(
            [sys.executable, "-c", (
                f"import sys; sys.path.insert(0, {REPO!r})\n"
                "from omop2owl_vocab_spark.session import get_spark\n"
                "from omop2owl_vocab_spark.sources.synth import synth_code_files\n"
                "s = get_spark('gen', master='local[32]')\n"
                f"synth_code_files(s, {rows}).write.mode('overwrite')"
                f".parquet({work!r} + '/code_files')\n"
            )],
            capture_output=True, text=True, timeout=1800,
        )
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-2000:])
        src = os.path.join(work, "code_files")

        result["ceiling_start"] = ceiling_pair(lo, hi)
        samples: dict[str, dict[int, list[float]]] = {
            n: {lo: [], hi: []} for n in names
        }
        triples = None
        for rep in range(reps):
            for name in names:
                cfg = CONFIGS[name]
                for cpus in (lo, hi):
                    leg = run_leg(cpus, src, cfg["java"],
                                  cpus * cfg["sp_mult"])
                    triples = leg["triples"]
                    samples[name][cpus].append(leg["wall_sec"])
                    print(json.dumps({"config": name, "rep": rep,
                                      "cpus": cpus,
                                      "wall_sec": round(leg["wall_sec"], 2)}),
                          flush=True)
        result["ceiling_end"] = ceiling_pair(lo, hi)
        result["triples"] = triples

        frontier = {}
        for name in names:
            walls_lo, walls_hi = samples[name][lo], samples[name][hi]
            best_lo, best_hi = min(walls_lo), min(walls_hi)
            med = lambda xs: sorted(xs)[len(xs) // 2] if len(xs) % 2 else (
                sorted(xs)[len(xs) // 2 - 1] + sorted(xs)[len(xs) // 2]) / 2
            frontier[name] = {
                "walls_lo": [round(w, 2) for w in walls_lo],
                "walls_hi": [round(w, 2) for w in walls_hi],
                "thr_lo": round(triples / med(walls_lo), 1),
                "thr_hi": round(triples / med(walls_hi), 1),
                "eff_median": round(
                    (med(walls_lo) / med(walls_hi)) / (hi / lo), 3
                ),
                "eff_best": round((best_lo / best_hi) / (hi / lo), 3),
            }
        result["frontier"] = frontier
        best = max(frontier, key=lambda n: frontier[n]["eff_median"])
        result["best_config"] = best
        result["best_eff_median"] = frontier[best]["eff_median"]
        print(json.dumps(result, indent=1))
        if out_path:
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
