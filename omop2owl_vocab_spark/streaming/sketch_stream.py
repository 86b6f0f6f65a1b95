"""Streaming HyperLogLog: maintain per-group register tables while
values arrive as micro-batches — the streaming twin of
``operators/sketch.py:hll_registers``, and the payoff of keeping the
sketch as plain mergeable longs instead of Spark's engine-private
HLL++ binary.

Pattern: ``foreachBatch`` incremental merge, as in
``upsert_stream``.  Each micro-batch is folded to ITS OWN register
table (one hash-agg over the batch), then merged with the persisted
table by per-(group, bucket) ``max(max_rho)`` — max is associative,
commutative, and idempotent, so ANY arrival order, batching, or even
REPLAYED batch produces the identical table the one-shot batch
operator yields over the full stream; the twin test asserts exactly
that, estimate included.  Replay-idempotence is the at-least-once
story: a foreachBatch retry after a partial write cannot corrupt the
sketch, unlike a count-based aggregate.

State is ≤ 2^b rows per group FOREVER — the unbounded-cardinality
distinct-count problem ("unique users all time") reduced to a bounded
table an object store can hold; the same merge runs cross-shard or
cross-stream.  The snapshot swap is the crash-safe three-step replace
from ``streaming/_store.py`` (never both copies gone, half-done swaps
repaired before the next merge); on an object store the body becomes
a table-format MERGE commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

from omop2owl_vocab_spark.operators.sketch import hll_registers
from omop2owl_vocab_spark.streaming._store import atomic_replace, recover

HLL_STREAM_SCHEMA = StructType(
    [
        StructField("grp", StringType(), True),
        StructField("v", StringType(), True),
    ]
)


def hll_stream(
    spark: SparkSession,
    source_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    b: int = 8,
    files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold an append-only (grp, v) directory into a persisted
    register table at ``registers_dir`` (parquet, atomically replaced
    per micro-batch)."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        recover(registers_dir)  # repair a swap a previous kill left half-done
        regs = hll_registers(batch, ["grp"], "v", b=b)
        sess = batch.sparkSession
        if os.path.exists(registers_dir):
            old = sess.read.parquet(registers_dir)
            merged = (
                old.unionByName(regs)
                .groupBy("grp", "bucket")
                .agg(F.max("max_rho").cast("long").alias("max_rho"))
            )
        else:
            merged = regs
        atomic_replace(merged, registers_dir, batch_id)

    stream = (
        spark.readStream.schema(HLL_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
