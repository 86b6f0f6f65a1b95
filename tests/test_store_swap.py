"""streaming/_store.py: the crash-safe snapshot swap — every kill
window leaves recoverable state."""

import os

from omop2owl_vocab_spark.streaming._store import atomic_replace, recover


def _write(spark, target, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    atomic_replace(df, target, batch_id=len(rows))


def _read(spark, target):
    return sorted(map(tuple, spark.read.parquet(target).collect()))


def test_replace_then_read(spark, tmp_path):
    t = str(tmp_path / "snap")
    _write(spark, t, [(1, "a")])
    _write(spark, t, [(1, "a"), (2, "b")])
    assert _read(spark, t) == [(1, "a"), (2, "b")]
    # no stale side dirs survive a clean swap
    assert not os.path.exists(t + ".__old")


def test_recover_promotes_set_aside_state(spark, tmp_path):
    # simulate the one dangerous kill window: target renamed to .__old,
    # replacement not yet in place
    t = str(tmp_path / "snap")
    _write(spark, t, [(1, "a"), (2, "b")])
    os.rename(t, t + ".__old")
    assert not os.path.exists(t)
    recover(t)
    assert _read(spark, t) == [(1, "a"), (2, "b")]
    # recover is idempotent and a no-op when state is healthy
    recover(t)
    assert _read(spark, t) == [(1, "a"), (2, "b")]


def test_stale_tmp_from_killed_batch_is_ignored(spark, tmp_path):
    # a write that died mid-parquet leaves a .__next dir; the next
    # replace with the same batch id must clean and proceed
    t = str(tmp_path / "snap")
    os.makedirs(t + ".__next1")
    open(t + ".__next1/garbage", "w").write("x")
    df = spark.createDataFrame([(9, "z")], "k long, v string")
    atomic_replace(df, t, batch_id=1)
    assert _read(spark, t) == [(9, "z")]
