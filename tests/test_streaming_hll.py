"""Streaming incremental HLL register merge == batch hll_registers
over the full stream — any batching, overlap, or replay included."""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.sketch import hll_estimate, hll_registers
from omop2owl_vocab_spark.streaming.sketch_stream import (
    HLL_STREAM_SCHEMA,
    hll_stream,
)

CHUNKS = [
    [Row(grp="g", v=f"x{i}") for i in range(0, 150)],
    # overlaps chunk 1 (duplicates across batches must not change regs)
    [Row(grp="g", v=f"x{i}") for i in range(100, 250)]
    + [Row(grp="h", v=f"y{i}") for i in range(40)],
    [Row(grp="g", v=f"x{i}") for i in range(250, 300)]
    + [Row(grp="h", v=f"y{i}") for i in range(20, 60)],
]


def test_stream_hll_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, chunk in enumerate(CHUNKS):
        if i:
            time.sleep(1.1)  # deterministic file order (mtime-based)
        spark.createDataFrame(chunk, HLL_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(src, mode="append")

    regs_dir = str(tmp_path / "regs")
    q = hll_stream(spark, src, regs_dir, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120), "stream did not finish in time"

    got = sorted(
        map(tuple, spark.read.parquet(regs_dir).collect())
    )
    full = spark.createDataFrame(
        [r for c in CHUNKS for r in c], HLL_STREAM_SCHEMA
    )
    want = sorted(map(tuple, hll_registers(full, ["grp"], "v").collect()))
    assert got == want

    # the estimates derived from streamed registers match the batch path
    est_stream = {
        r["grp"]: r["est_e4"]
        for r in hll_estimate(
            spark.read.parquet(regs_dir).select(
                "grp", "bucket", F.col("max_rho").cast("long").alias("max_rho")
            ),
            ["grp"],
        ).collect()
    }
    est_batch = {
        r["grp"]: r["est_e4"]
        for r in hll_estimate(hll_registers(full, ["grp"], "v"), ["grp"]).collect()
    }
    assert est_stream == est_batch
