"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors;
in-sandbox stand-in: the same job pinned to 8 vs 32 cores on identical
input — the driver-sanctioned "N and 4N cores" emulation).

Fairness choices (documented in BENCH/BASELINE.md):
- each measurement runs in a FRESH subprocess/JVM, `taskset`-pinned to N
  cores, so the 8-core run cannot borrow the other 24 cores for GC /
  shuffle / writer threads the way un-pinned local[8] does;
- all inputs/outputs/shuffle dirs live on tmpfs (/dev/shm) — a single
  SATA disk is the sandbox artifact, not the modeled system; a 1000-
  executor cluster's object store scales bandwidth with the fleet;
- JVM/codegen warmup on a 100-row slice before the timed section.

Usage: python tools/bench_scaling.py [rows] [--json out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

_CHILD = r"""
import glob, json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

cpus = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  extra_conf={{
                      "spark.sql.shuffle.partitions": str(cpus * 2),
                      "spark.local.dir": os.path.join(out, "_sparklocal"),
                  }})
spark.sparkContext.setLogLevel("ERROR")
warm = spark.read.parquet(src).limit(100)
warm.count()
t0 = time.monotonic()
report = run_pipeline(spark, PipelineConfig(source=src, output_dir=out, resume=False))
wall = time.monotonic() - t0
n = spark.read.parquet(os.path.join(out, "triples")).count()
stage_walls = {{}}
for m in glob.glob(os.path.join(out, "ckpt", "*", "_metrics.json")):
    d = json.load(open(m))
    stage_walls[d["stage"]] = d["wall_sec"]
print(json.dumps({{"cpus": cpus, "wall_sec": wall, "triples": n,
                   "stage_walls": stage_walls,
                   "cc": report["stages"].get("s4_link", {{}})}}))
"""


def run_at(cpus: int, src: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"scaling_{cpus}_", dir=WORK_ROOT)
    try:
        script = _CHILD.format(repo=REPO)
        cmd = [sys.executable, "-c", script, str(cpus), src, out]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        return json.loads(proc.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 400000
    work = tempfile.mkdtemp(prefix="scaling_src_", dir=WORK_ROOT)
    try:
        gen = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    f"import sys; sys.path.insert(0, {REPO!r});\n"
                    "from omop2owl_vocab_spark.session import get_spark\n"
                    "from omop2owl_vocab_spark.sources.synth import synth_code_files\n"
                    f"s = get_spark('gen', master='local[32]')\n"
                    f"synth_code_files(s, {rows}).write.mode('overwrite')"
                    f".parquet({work!r} + '/code_files')\n"
                ),
            ],
            capture_output=True, text=True, timeout=1800,
        )
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-2000:])
        src = os.path.join(work, "code_files")

        r8 = run_at(8, src)
        r32 = run_at(32, src)
        thr8 = r8["triples"] / r8["wall_sec"]
        thr32 = r32["triples"] / r32["wall_sec"]
        eff = (thr32 / thr8) / 4
        result = {
            "rows": rows,
            "cores8": {
                "wall_sec": round(r8["wall_sec"], 2),
                "triples_per_sec": round(thr8, 1),
                "stage_walls": r8["stage_walls"],
                "cc_rounds": r8["cc"].get("rounds"),
            },
            "cores32": {
                "wall_sec": round(r32["wall_sec"], 2),
                "triples_per_sec": round(thr32, 1),
                "stage_walls": r32["stage_walls"],
                "cc_rounds": r32["cc"].get("rounds"),
            },
            "triples": r32["triples"],
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(result, indent=1))
        if "--json" in sys.argv:
            out_path = sys.argv[sys.argv.index("--json") + 1]
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
