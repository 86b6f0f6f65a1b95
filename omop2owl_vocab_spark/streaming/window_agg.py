"""Streaming event-time windowed aggregation with a watermark — the
canonical late-data pattern (§2.10): tumbling windows close and emit
exactly once when the watermark passes window end, and events later than
the watermark are dropped rather than corrupting closed windows.

Unlike the sessionizer (custom state via ``applyInPandasWithState``),
this is Spark's NATIVE stateful operator — ``withWatermark`` +
``groupBy(window(...))`` in append mode — kept deliberately built-in:
watermark bookkeeping, state store, and late-row filtering all stay
JVM-side.  The batch twin below is the oracle-checkable equivalent
(driver query ``q_event_windows``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from omop2owl_vocab_spark.streaming.sessionize import EVENTS_SCHEMA


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Shared aggregation shape — works on a batch OR streaming frame."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source micro-batches → watermarked tumbling-window counts,
    append mode: a window row is emitted exactly once, after the watermark
    passes its end."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    agg = windowed_counts(stream.withWatermark("ts", watermark), window)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
