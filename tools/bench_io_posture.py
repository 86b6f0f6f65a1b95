"""Off-tmpfs I/O posture point (r4 verdict #6): the same 4M-row pipeline
with ALL work dirs (source, checkpoints, output) on tmpfs (/dev/shm) vs
the real block device (/tmp on ext4 / virtio vda) — the sandbox analog of
object-store/disk latency a real cluster pays on checkpoint read-back.

Per medium, two measured phases:
- ``cold``: full pipeline — computes every stage, WRITES checkpoints +
  final partitioned parquet;
- ``relayout``: triples+manifest wiped, rerun — READS the s1/s3/s4
  checkpoints and replays only canon-rewrite → repartition → write (the
  read-amplified resume path the checkpoint design exists for).

Before each disk-medium phase the page cache is dropped (best effort —
recorded in the output) so ext4 numbers are honest reads, not cache hits.
Phases are interleaved across media.  Output: BENCH_IO_POSTURE.json with
per-medium medians + the checkpoint-read delta.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from omop2owl_vocab_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig,
    run_pipeline,
)
from omop2owl_vocab_spark.session import get_spark  # noqa: E402
from omop2owl_vocab_spark.sources.synth import synth_code_files  # noqa: E402

N_ROWS = int(os.environ.get("IO_N", 4_000_000))
ROUNDS = int(os.environ.get("IO_ROUNDS", 2))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
MEDIA = {
    "tmpfs": os.environ.get("IO_TMPFS_ROOT", "/dev/shm/io_ab"),
    "disk": os.environ.get("IO_DISK_ROOT", "/tmp/io_ab"),
}


def _drop_caches() -> bool:
    try:
        subprocess.run(["sync"], check=True, timeout=60)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _cfg(root: str) -> PipelineConfig:
    return PipelineConfig(
        source=f"{root}/src",
        output_dir=f"{root}/out",
        compact_output=True,
        salt_threshold_rows=200_000,
        salt_buckets=16,
    )


def _du(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def _run(medium: str, phase: str) -> dict:
    root = MEDIA[medium]
    out = f"{root}/out"
    if phase == "cold":
        shutil.rmtree(out, ignore_errors=True)
    else:
        shutil.rmtree(f"{out}/triples", ignore_errors=True)
        try:
            os.remove(f"{out}/_manifest.json")
        except OSError:
            pass
    dropped = _drop_caches() if medium == "disk" else False
    t0 = time.monotonic()
    run_pipeline(spark, _cfg(root))
    wall = time.monotonic() - t0
    return {
        "medium": medium,
        "phase": phase,
        "wall_sec": round(wall, 2),
        "caches_dropped": dropped,
    }


if __name__ == "__main__":
    spark = get_spark(
        "io-posture",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": CPUS},
    )
    for medium, root in MEDIA.items():
        if not os.path.exists(f"{root}/src/_SUCCESS"):
            shutil.rmtree(root, ignore_errors=True)
            synth_code_files(
                spark, N_ROWS, lang_cuts=(90, 92, 94, 96, 98)
            ).write.parquet(f"{root}/src")

    runs = []
    for phase in ("cold", "relayout"):
        for i in range(ROUNDS):
            for medium in MEDIA:  # interleaved tmpfs/disk
                r = _run(medium, phase)
                print(json.dumps(r))
                runs.append(r)

    result = {"n_rows": N_ROWS, "cpus": int(CPUS), "rounds": ROUNDS,
              "runs": runs}
    for medium, root in MEDIA.items():
        med = {}
        for phase in ("cold", "relayout"):
            vals = [r["wall_sec"] for r in runs
                    if r["medium"] == medium and r["phase"] == phase]
            med[phase + "_sec_median"] = round(statistics.median(vals), 2)
        med["ckpt_bytes"] = _du(f"{root}/out/ckpt")
        result[medium] = med
    result["relayout_disk_over_tmpfs"] = round(
        result["disk"]["relayout_sec_median"]
        / result["tmpfs"]["relayout_sec_median"],
        3,
    )
    result["cold_disk_over_tmpfs"] = round(
        result["disk"]["cold_sec_median"] / result["tmpfs"]["cold_sec_median"],
        3,
    )
    result["generated"] = dt.datetime.now(dt.timezone.utc).isoformat()
    with open("/root/repo/BENCH_IO_POSTURE.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))
