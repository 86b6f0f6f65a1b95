"""Streaming exact dedup for incremental corpus ingest: first-seen doc
per content hash wins, duplicates arriving later are dropped — Spark's
NATIVE ``dropDuplicatesWithinWatermark`` stateful operator (state is
evicted once the watermark passes, so the seen-hash store is bounded by
the watermark horizon instead of growing forever).

This is the streaming twin of ``operators/dedup.py:exact_duplicates``:
an append-only corpus directory is continuously deduplicated as files
land, instead of re-running the batch hash-aggregate over the whole
corpus.  Content hash follows the same F1 rule (md5 over
coalesce(text, '')).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("text", StringType(), True),
    ]
)


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    files_per_trigger: int = 1,
) -> StreamingQuery:
    """Emit each content hash's FIRST-SEEN doc row; duplicates within the
    watermark horizon are suppressed by the state store.  (Duplicates
    farther apart than the horizon can re-emit — that's the documented
    bounded-state trade; a periodic batch ``exact_duplicates`` compaction
    over the output closes the gap, same division of labor as the
    streaming ingest module.)"""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    deduped = (
        stream.withColumn("h", F.md5(F.coalesce(F.col("text"), F.lit(""))))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["h"])
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
