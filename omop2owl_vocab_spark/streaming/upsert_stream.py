"""Streaming CDC upsert: maintain a last-writer-wins snapshot while the
changelog arrives as micro-batches — the streaming twin of
``operators/cdc.py:changelog_apply``.

Pattern: ``foreachBatch`` incremental merge.  Each micro-batch is first
collapsed to its per-key winners (a tiny batch-local
``changelog_apply``), then merged with the persisted snapshot by
re-applying the same winner rule over (old snapshot ∪ batch winners) —
associativity of max-by-sequence makes the incremental fold equal the
batch answer over the full log, which the twin test asserts.

Tombstones are RETAINED in the stored snapshot (op column kept) so a
late-arriving older update cannot resurrect a deleted key; readers
filter deletes at query time via ``read_snapshot``.

The snapshot swap is the crash-safe three-step replace from
``streaming/_store.py`` (never both copies gone); on an object store
the same ``foreachBatch`` body would be a table-format MERGE commit
(Iceberg/Delta) — the micro-batch collapse and winner rule are
unchanged, only the atomic-commit primitive differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from omop2owl_vocab_spark.operators.cdc import changelog_apply
from omop2owl_vocab_spark.streaming._store import atomic_replace, recover

CDC_STREAM_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("op", StringType(), True),
        StructField("val", StringType(), True),
        StructField("seq", LongType(), True),
    ]
)

_KEYS = ["k"]
_SEQ = ["seq"]


def upsert_stream(
    spark: SparkSession,
    source_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold an append-only changelog directory into ``snapshot_dir``
    (parquet, atomically replaced per micro-batch)."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        recover(snapshot_dir)  # repair a swap a previous kill left half-done
        winners = changelog_apply(batch, _KEYS, _SEQ)
        sess = batch.sparkSession
        if os.path.exists(snapshot_dir):
            old = sess.read.parquet(snapshot_dir)
            merged = changelog_apply(
                old.unionByName(winners), _KEYS, _SEQ
            )
        else:
            merged = winners
        atomic_replace(merged, snapshot_dir, batch_id)

    stream = (
        spark.readStream.schema(CDC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    delete_values: tuple[str, ...] = ("D",),
) -> DataFrame:
    """Reader view of the maintained snapshot: tombstoned keys hidden."""
    return spark.read.parquet(snapshot_dir).filter(
        ~F.col("op").isin(list(delete_values))
    )
