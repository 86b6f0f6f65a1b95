"""Large-input robustness point: run the full pipeline at N rows in a
fresh JVM and record wall, throughput, per-stage walls, and CC
convergence — the doubling ladder that locates the next wall before it's
load-bearing (8M → 16M in r3, 32M in r4).

Usage:
  python tools/bench_robustness.py [rows] [cores] [--mem 24g]
      [--buckets 64] [--json OUT.json]

Input is generated on tmpfs at full parallelism, then the timed child
runs with SPARK_GRAFT_DRIVER_MEM (local mode holds every executor's
working set in ONE heap — 8g OOMs past ~8M rows; a real cluster brings
one heap per executor).  --buckets > 0 uses bucketed s1 checkpoints
(co-located emission join, the Iceberg storage-partitioned-join analog).
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

_CHILD = r"""
import glob, json, os, sys, time
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

cpus = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
buckets = int(sys.argv[4])
spill = sys.argv[5] if len(sys.argv) > 5 else os.path.join(out, "_sparklocal")
spark = get_spark("robust", master=f"local[{{cpus}}]",
                  extra_conf={{
                      "spark.sql.shuffle.partitions": str(cpus * 2),
                      "spark.local.dir": spill,
                  }})
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(src).limit(100).count()
t0 = time.monotonic()
report = run_pipeline(spark, PipelineConfig(
    source=src, output_dir=out, resume=False, bucket_count=buckets))
wall = time.monotonic() - t0
n = spark.read.parquet(os.path.join(out, "triples")).count()
stage_walls = {{}}
for m in glob.glob(os.path.join(out, "ckpt", "*", "_metrics.json")):
    d = json.load(open(m))
    stage_walls[d["stage"]] = d["wall_sec"]
print(json.dumps({{"wall_sec": wall, "triples": n,
                   "stage_walls": stage_walls,
                   "cc": report["stages"].get("s4_link", {{}})}}))
"""


def main() -> None:
    argv = sys.argv[1:]

    def opt(name: str, default: str) -> str:
        # strip flag+value from argv so option values never leak into the
        # positional digit scan below
        if name not in argv:
            return default
        i = argv.index(name)
        if i + 1 >= len(argv):
            raise SystemExit(f"{name} needs a value")
        val = argv[i + 1]
        del argv[i : i + 2]
        return val

    mem = opt("--mem", "24g")
    buckets = int(opt("--buckets", "64"))
    out_path = opt("--json", "")
    # --work: override the scratch root.  tmpfs pages + the child JVM heap
    # share the same 128 GiB of RAM (measured: 48M rows OOMs with work on
    # tmpfs even at a 30g heap — the final-write shuffle spill balloons
    # the tmpfs footprint).  --spill: put spark.local.dir (shuffle spill —
    # write-once read-once, no reason to pay RAM for it) on the real
    # disk, which BENCH_IO_POSTURE.json measured at parity.
    work_root = opt("--work", WORK_ROOT)
    spill_root = opt("--spill", "")

    args = [a for a in argv if a.isdigit()]
    rows = int(args[0]) if args else 32_000_000
    cores = int(args[1]) if len(args) > 1 else 32

    work = tempfile.mkdtemp(prefix="robust_", dir=work_root)
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
            capture_output=True, text=True, timeout=3600,
            env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem),
        )
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-2000:])
        out = os.path.join(work, "out")
        child_args = [str(cores), os.path.join(work, "code_files"), out,
                      str(buckets)]
        spill_dir = ""
        if spill_root:
            spill_dir = tempfile.mkdtemp(prefix="robust_spill_", dir=spill_root)
            child_args.append(spill_dir)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO), *child_args],
            capture_output=True, text=True, timeout=5400,
            env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem),
        )
        if spill_dir:
            shutil.rmtree(spill_dir, ignore_errors=True)
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-3000:])
        leg = json.loads(proc.stdout.strip().splitlines()[-1])
        result = {
            "rows": rows,
            "cores": cores,
            "driver_mem": mem,
            "bucket_count": buckets,
            "wall_sec": round(leg["wall_sec"], 1),
            "triples": leg["triples"],
            "triples_per_sec": round(leg["triples"] / leg["wall_sec"]),
            "stage_walls": leg["stage_walls"],
            "cc": leg["cc"],
            "child_total_sec": round(time.time() - t0, 1),
        }
        print(json.dumps(result, indent=1))
        if out_path:
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
