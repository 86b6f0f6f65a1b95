"""Benchmark harness (driver contract + north-rule metric).

Runs every ``__spark_entry__.queries()`` entry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the
full KG pipeline end-to-end (synthetic code_files → triples) reporting
triples/sec — the BASELINE.json headline metric.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pipeline": {...}}

Execution is forced with the noop data source (full computation, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from omop2owl_vocab_spark.session import get_spark  # noqa: E402
from omop2owl_vocab_spark.sources.synth import synth_code_files  # noqa: E402

PIPELINE_ROWS = int(os.environ.get("SPARK_GRAFT_PIPELINE_ROWS", "100000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/Arrow warmup so the first timed query isn't charged for it
    _force(
        spark.read.parquet(f"{sf_dir}/nation.parquet").selectExpr(
            "sha2(cast(n_nationkey as string), 256) as h"
        )
    )

    per_query: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        per_query[name] = round(time.monotonic() - t0, 3)

    # end-to-end pipeline: code_files → triples (the north-rule metric);
    # tmpfs when available — a single local disk is the sandbox artifact,
    # not the modeled storage layer (see BENCH.md)
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    warm = tempfile.mkdtemp(prefix="bench_warm_", dir=work_root)
    try:
        # JIT the pipeline plans on a tiny input so the timed run measures
        # the pipeline, not first-use codegen
        wsrc = os.path.join(warm, "code_files")
        synth_code_files(spark, 2000).write.parquet(wsrc)
        run_pipeline(
            spark,
            PipelineConfig(
                source=wsrc, output_dir=os.path.join(warm, "out"), resume=False
            ),
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    work = tempfile.mkdtemp(prefix="bench_pipeline_", dir=work_root)
    try:
        src = os.path.join(work, "code_files")
        synth_code_files(spark, PIPELINE_ROWS).write.mode("overwrite").parquet(src)
        cfg = PipelineConfig(
            source=src, output_dir=os.path.join(work, "out"), resume=False
        )
        t0 = time.monotonic()
        run_pipeline(spark, cfg)
        pipeline_sec = time.monotonic() - t0
        n_triples = spark.read.parquet(os.path.join(work, "out", "triples")).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    per_query["pipeline_e2e"] = round(pipeline_sec, 3)
    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "pipeline": {
                    "rows_in": PIPELINE_ROWS,
                    "triples_out": n_triples,
                    "sec": round(pipeline_sec, 3),
                    "triples_per_sec": round(n_triples / pipeline_sec, 1),
                },
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
