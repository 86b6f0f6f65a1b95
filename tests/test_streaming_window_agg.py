"""Watermarked streaming window aggregation vs its batch twin, including
the late-data drop semantics that make append mode safe."""

import datetime as dt

from pyspark.sql import Row

from omop2owl_vocab_spark.streaming.sessionize import EVENTS_SCHEMA
from omop2owl_vocab_spark.streaming.window_agg import (
    windowed_counts,
    windowed_counts_stream,
)

BASE = dt.datetime(2024, 1, 1, 8, 0, 0)


def _ev(eid, minutes, etype="e", value=1.0):
    return Row(
        event_id=eid, ts=BASE + dt.timedelta(minutes=minutes), user_id=1,
        event_type=etype, value=value, props="",
    )


def _stage(spark, src, chunks):
    import time

    for i, chunk in enumerate(chunks):
        if i:
            # the file source orders micro-batches by modification time;
            # separate the writes so chunk order is deterministic
            time.sleep(1.1)
        spark.createDataFrame(chunk, EVENTS_SCHEMA).coalesce(1).write.parquet(
            src, mode="append"
        )


def test_stream_windows_match_batch(spark, tmp_path):
    """On-time multi-batch input: the streamed append-mode output equals
    the batch aggregation over every window the watermark closed."""
    src = str(tmp_path / "src")
    rows1 = [_ev(1, 0), _ev(2, 10), _ev(3, 70, "f", 2.0)]
    rows2 = [_ev(4, 130), _ev(5, 140, "f", 3.0)]
    rows3 = [_ev(6, 600)]  # sentinel: watermark passes all prior windows
    _stage(spark, src, [rows1, rows2, rows3])

    out = str(tmp_path / "out")
    q = windowed_counts_stream(
        spark, src, out, str(tmp_path / "ckpt"), files_per_trigger=1
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    all_events = spark.createDataFrame(rows1 + rows2 + rows3, EVENTS_SCHEMA)
    expected_closed = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in windowed_counts(all_events).collect()
        # the sentinel's own window never closes (watermark stops at max
        # event time − delay) — append mode can't have emitted it
        if r["window_start"] < BASE + dt.timedelta(minutes=600)
    }
    assert got == expected_closed and got


def test_late_event_after_emission_never_duplicates(spark, tmp_path):
    """Append-mode guarantee (measured on Spark 4.1: the late-row filter
    lags the watermark by one batch, so a within-state late event may
    still merge — acceptable): once a window HAS been emitted, an even
    later event for it must neither re-emit nor duplicate the window row,
    and the stream must not crash."""
    src = str(tmp_path / "src")
    _stage(
        spark,
        src,
        [
            [_ev(1, 0), _ev(2, 10)],      # window [08:00, 09:00)
            [_ev(3, 200)],                # watermark → 10:50
            [_ev(4, 130)],                # batch whose end evicts+emits 08:00
            [_ev(5, 5)],                  # VERY late: window already emitted
            [_ev(6, 600)],                # sentinel: flush remaining windows
        ],
    )
    out = str(tmp_path / "out")
    q = windowed_counts_stream(
        spark, src, out, str(tmp_path / "ckpt"), watermark="30 minutes",
        files_per_trigger=1,
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    base_rows = [
        r for r in spark.read.parquet(out).collect() if r["window_start"] == BASE
    ]
    # exactly ONE row for the 08:00 window, with only the on-time events —
    # the post-emission late event neither duplicated nor mutated it
    assert len(base_rows) == 1
    assert base_rows[0]["n_events"] == 2
