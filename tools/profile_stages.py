"""Phase-isolation profiler: times each pipeline phase with a noop sink at
a given core count, separating compute from parquet writes.

Usage: python tools/profile_stages.py <rows> <cores>
(pins itself with taskset when available; work on tmpfs)
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


def child(rows: int, cores: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from omop2owl_vocab_spark.operators.canon import canonicalize_triples
    from omop2owl_vocab_spark.operators.emit import dedupe_triples, emit_triples
    from omop2owl_vocab_spark.operators.link import canonical_map, connected_components
    from omop2owl_vocab_spark.plans.derive import derive_concepts, derive_edges
    from omop2owl_vocab_spark.session import get_spark
    from omop2owl_vocab_spark.sources.synth import synth_code_files

    work = tempfile.mkdtemp(prefix=f"prof_{cores}_", dir=WORK_ROOT)
    spark = get_spark(
        "profile", master=f"local[{cores}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(cores * 2),
            "spark.local.dir": os.path.join(work, "_sparklocal"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        t[name] = round(time.monotonic() - t0, 2)

    src = os.path.join(work, "code_files")
    synth_code_files(spark, rows).write.parquet(src)
    cf = spark.read.parquet(src)
    noop(cf.limit(100))  # warmup

    timed("scan_only", lambda: noop(cf))
    timed("derive_concepts_compute", lambda: noop(derive_concepts(cf)))
    timed("derive_edges_compute", lambda: noop(derive_edges(cf)))

    cdir, edir = os.path.join(work, "c"), os.path.join(work, "e")
    timed("derive_concepts_write", lambda: derive_concepts(cf).write.parquet(cdir))
    timed("derive_edges_write", lambda: derive_edges(cf).write.parquet(edir))

    concepts = spark.read.parquet(cdir)
    edges = spark.read.parquet(edir)
    timed("emit_compute", lambda: noop(
        emit_triples(concepts, edges, ["ALL"], dedupe=False)))
    tdir = os.path.join(work, "t")
    timed("emit_write", lambda: emit_triples(
        concepts, edges, ["ALL"], dedupe=False).write.parquet(tdir))

    raw = spark.read.parquet(tdir)
    timed("dedup_compute", lambda: noop(dedupe_triples(raw)))

    def _cc():
        eq = edges.filter(F.col("relationship_id") == "Maps to").select(
            F.col("concept_id_1").alias("src"), F.col("concept_id_2").alias("dst"))
        labels, _ = connected_components(eq)
        globals()["_canon"] = canonical_map(labels).localCheckpoint(eager=True)

    timed("cc_total", _cc)
    timed("canon_dedup_compute", lambda: noop(
        canonicalize_triples(raw, globals()["_canon"])))
    fdir = os.path.join(work, "f")
    timed("canon_dedup_write_partitioned", lambda: (
        canonicalize_triples(raw, globals()["_canon"])
        .write.partitionBy("vocabulary_id").parquet(fdir)))

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"cores": cores, "rows": rows, "timings": t}))


def main() -> None:
    rows, cores = int(sys.argv[1]), int(sys.argv[2])
    if os.environ.get("_PROF_CHILD"):
        child(rows, cores)
        return
    cmd = [sys.executable, os.path.abspath(__file__), str(rows), str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ, _PROF_CHILD="1")
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    print(proc.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
