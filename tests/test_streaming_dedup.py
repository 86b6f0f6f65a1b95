"""Streaming exact dedup (dropDuplicatesWithinWatermark) vs the batch
first-seen semantics."""

import datetime as dt
import time

from pyspark.sql import Row

from omop2owl_vocab_spark.streaming.dedup_stream import (
    DOCS_STREAM_SCHEMA,
    dedup_stream,
)

BASE = dt.datetime(2024, 1, 1, 8, 0, 0)


def _doc(i, minutes, text):
    return Row(doc_id=i, ts=BASE + dt.timedelta(minutes=minutes), text=text)


def test_stream_dedup_keeps_first_seen(spark, tmp_path):
    src = str(tmp_path / "src")
    chunks = [
        [_doc(1, 0, "alpha"), _doc(2, 1, "beta")],
        # duplicate content in a LATER micro-batch must be suppressed
        [_doc(3, 5, "alpha"), _doc(4, 6, "gamma")],
        # null text groups with a future empty text (F1)
        [_doc(5, 7, None), _doc(6, 8, "")],
    ]
    for i, chunk in enumerate(chunks):
        if i:
            time.sleep(1.1)  # deterministic file order (mtime-based)
        spark.createDataFrame(chunk, DOCS_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(src, mode="append")

    out = str(tmp_path / "out")
    q = dedup_stream(spark, src, out, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120), "stream did not finish in time"

    rows = spark.read.parquet(out).collect()
    kept = {r["doc_id"] for r in rows}
    # one row per distinct content; first-seen ids win
    assert kept == {1, 2, 4, 5}
    texts = sorted((r["doc_id"], r["text"]) for r in rows)
    assert (5, None) in texts  # the null/empty group kept its first row
