"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors;
in-sandbox stand-in: local[8] vs local[32] on identical input).

Each measurement runs in a FRESH subprocess/JVM (a SparkSession's master
can't change in-process), timing the steady-state pipeline body:
code_files parquet → derive → emit → link → canonicalize → write.

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

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

cpus = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  extra_conf={{"spark.sql.shuffle.partitions": str(cpus * 2)}})
spark.sparkContext.setLogLevel("ERROR")
# JVM/codegen warmup on a tiny slice so we time the pipeline, not JIT
warm = spark.read.parquet(src).limit(100)
warm.count()
t0 = time.monotonic()
run_pipeline(spark, PipelineConfig(source=src, output_dir=out, resume=False))
wall = time.monotonic() - t0
n = spark.read.parquet(os.path.join(out, "triples")).count()
print(json.dumps({{"cpus": cpus, "wall_sec": wall, "triples": n}}))
"""


def run_at(cpus: int, src: str, rows: int) -> dict:
    """Pin the whole JVM to `cpus` cores with taskset: local[8] on a 32-core
    box otherwise keeps 32 cores for GC/shuffle/IO threads, which understates
    scaling vs a real 8-core (N-executor) cluster.  The north-rule criterion
    is N vs 4N cores on the same input."""
    out = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
    try:
        script = _CHILD.format(repo=REPO)
        cmd = [sys.executable, "-c", script, str(cpus), src, out]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-2000:])
        return json.loads(proc.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 400000
    work = tempfile.mkdtemp(prefix="scaling_src_")
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

        r8 = run_at(8, src, rows)
        r32 = run_at(32, src, rows)
        thr8 = r8["triples"] / r8["wall_sec"]
        thr32 = r32["triples"] / r32["wall_sec"]
        eff = (thr32 / thr8) / 4
        result = {
            "rows": rows,
            "local8": {"wall_sec": round(r8["wall_sec"], 2),
                       "triples_per_sec": round(thr8, 1)},
            "local32": {"wall_sec": round(r32["wall_sec"], 2),
                        "triples_per_sec": round(thr32, 1)},
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
