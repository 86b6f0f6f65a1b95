"""Streaming incremental CDC merge == batch changelog_apply over the
full log, including cross-batch out-of-order writes, tombstones, and
resurrection."""

import time

from pyspark.sql import Row

from omop2owl_vocab_spark.operators.cdc import changelog_apply
from omop2owl_vocab_spark.streaming.upsert_stream import (
    CDC_STREAM_SCHEMA,
    read_snapshot,
    upsert_stream,
)


def _row(k, op, val, seq):
    return Row(k=k, op=op, val=val, seq=seq)


CHUNKS = [
    # batch 1: inserts
    [_row(1, "I", "a1", 10), _row(2, "I", "b1", 11), _row(3, "I", "c1", 12)],
    # batch 2: update key 1, delete key 2
    [_row(1, "U", "a2", 20), _row(2, "D", None, 21)],
    # batch 3: LATE update for key 2 (seq 15 < tombstone 21 — must NOT
    # resurrect), an update for key 3, and a genuine re-insert of
    # key 2 at seq 30
    [_row(2, "U", "b-late", 15), _row(3, "U", "c2", 25), _row(2, "I", "b2", 30)],
]


def test_stream_upsert_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, chunk in enumerate(CHUNKS):
        if i:
            time.sleep(1.1)  # deterministic file order (mtime-based)
        spark.createDataFrame(chunk, CDC_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(src, mode="append")

    snap = str(tmp_path / "snap")
    q = upsert_stream(spark, src, snap, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120), "stream did not finish in time"

    got = {
        r["k"]: (r["op"], r["val"], r["seq"])
        for r in read_snapshot(spark, snap).collect()
    }
    # batch twin over the concatenated log
    full = spark.createDataFrame(
        [r for c in CHUNKS for r in c], CDC_STREAM_SCHEMA
    )
    want = {
        r["k"]: (r["op"], r["val"], r["seq"])
        for r in changelog_apply(
            full, ["k"], ["seq"], op_col="op", delete_values=("D",)
        ).collect()
    }
    assert got == want
    # and the specific semantics: 1 updated, 2 resurrected at seq 30,
    # 3 updated — the late seq-15 write never surfaced
    assert got == {
        1: ("U", "a2", 20),
        2: ("I", "b2", 30),
        3: ("U", "c2", 25),
    }


def test_stream_upsert_tombstone_retained_internally(spark, tmp_path):
    """The stored snapshot keeps the tombstone row (late-write guard);
    only the reader view hides it."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [_row(1, "I", "x", 1), _row(2, "D", None, 2)], CDC_STREAM_SCHEMA
    ).coalesce(1).write.parquet(src, mode="append")
    snap = str(tmp_path / "snap")
    q = upsert_stream(spark, src, snap, str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)
    stored = {r["k"]: r["op"] for r in spark.read.parquet(snap).collect()}
    assert stored == {1: "I", 2: "D"}
    assert [r["k"] for r in read_snapshot(spark, snap).collect()] == [1]
