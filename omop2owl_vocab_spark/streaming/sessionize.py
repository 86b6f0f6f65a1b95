"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState`` (Arrow-batched per-group state, event-time
timeout).

This is the (b)-tier pattern from the build rules: semantics Spark's
built-in operators can't express in streaming — a session closes only when
the *watermark* passes its last event + gap, and the closed session is
emitted exactly once.  Batch-side equivalent (oracle-checkable):
``F.session_window`` — see __spark_entry__ ``q_sessionize``.

State per user: (session_start_ms, last_ts_ms, n_events, sum_value).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)

GAP_MS = 30 * 60 * 1000


def _session_fn(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_events": [n],
                "sum_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
    vals = rows["value"].to_numpy()

    if state.exists:
        start_ms, last_ms, n, total = state.get
    else:
        start_ms, last_ms, n, total = int(ts_ms[0]), int(ts_ms[0]) - 1, 0, 0.0

    closed: list[tuple[int, int, int, float]] = []
    for t, v in zip(ts_ms, vals):
        t = int(t)
        if n > 0 and t - last_ms > GAP_MS:
            closed.append((start_ms, last_ms, n, total))
            n, total = 0, 0.0
        if n == 0:
            start_ms, last_ms = t, t
        else:
            # Cross-batch out-of-order: a within-watermark late event can be
            # OLDER than the state's last_ms (each batch is sorted; batches
            # aren't mutually ordered).  Fold it in by widening the session
            # in both directions — start_ms lowers, last_ms never regresses
            # (a regressed last_ms would shrink the timeout and mis-close).
            # Residual documented divergence vs the batch session_window
            # twin: a late event older than start_ms - gap belonged to an
            # earlier, possibly already-emitted session; it is absorbed
            # here rather than retracted (append-mode streams can't retract).
            start_ms = min(start_ms, t)
            last_ms = max(last_ms, t)
        n, total = n + 1, total + float(v)

    state.update((start_ms, last_ms, n, total))
    # close the open session when the watermark passes last event + gap;
    # clamp to just past the CURRENT watermark — a group whose events are
    # old relative to the stream head would otherwise request a timeout in
    # the past, which Spark rejects and the query dies
    timeout_ms = max(last_ms + GAP_MS, state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(timeout_ms)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in closed],
                "n_events": [n_ for _, _, n_, _ in closed],
                "sum_value": [tot for _, _, _, tot in closed],
            }
        )


def sessionize_stream(
    spark,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    files_per_trigger: int = 1,
):
    """File-source micro-batch sessionization; sessions emit when closed by
    a gap within the stream or by event-time timeout."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    sessions = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch twin (F.session_window) — the oracle-checkable equivalent."""
    from pyspark.sql import functions as F

    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
