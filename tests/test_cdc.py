"""changelog_apply (last-writer-wins MERGE) and scd2_history
(validity-interval versioning) — handcrafted logs with delete/resurrect
and attribute-flap cases."""

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.cdc import changelog_apply, scd2_history


def _log(spark):
    rows = [
        # key 1: insert -> update; last op update -> survives with v=20
        (1, "I", 10, 100),
        (1, "U", 20, 200),
        # key 2: update then delete LAST -> dropped
        (2, "U", 5, 100),
        (2, "D", None, 300),
        # key 3: delete then re-insert -> resurrected with v=7
        (3, "D", None, 100),
        (3, "I", 7, 250),
        # key 4: two writes with equal seq broken by op order? no —
        # seq is unique per key here; single row survives as-is
        (4, "I", 1, 50),
    ]
    return spark.createDataFrame(rows, "k int, op string, v int, seq int")


def test_changelog_apply_last_writer_wins(spark):
    out = changelog_apply(
        _log(spark), keys=["k"], seq_cols=["seq"],
        op_col="op", delete_values=("D",),
    )
    got = {r["k"]: (r["op"], r["v"], r["seq"]) for r in out.collect()}
    assert got == {1: ("U", 20, 200), 3: ("I", 7, 250), 4: ("I", 1, 50)}


def test_changelog_apply_no_op_col_keeps_tombstones(spark):
    out = changelog_apply(_log(spark), keys=["k"], seq_cols=["seq"])
    got = {r["k"]: r["op"] for r in out.collect()}
    assert got == {1: "U", 2: "D", 3: "I", 4: "I"}


def test_changelog_apply_composite_seq(spark):
    # same primary seq, tiebreak column decides
    rows = [(1, "a", 100, 1), (1, "b", 100, 2)]
    df = spark.createDataFrame(rows, "k int, val string, ts int, lsn int")
    out = changelog_apply(df, keys=["k"], seq_cols=["ts", "lsn"])
    assert out.collect()[0]["val"] == "b"


def test_changelog_apply_validates_seq_cols(spark):
    with pytest.raises(ValueError, match="seq_cols"):
        changelog_apply(_log(spark), keys=["k"], seq_cols=["nope"])


def test_scd2_history_versions_and_intervals(spark):
    rows = [
        # key 1: a a b a  -> versions a[10,30) b[30,40) a[40,None)
        (1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "a", 40),
        # key 2: single value -> one open version
        (2, "x", 5),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, seq int")
    out = scd2_history(df, keys=["k"], attr_cols=["attr"], seq_col="seq")
    got = sorted(
        (r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert got == [
        (1, 1, "a", 10, 30),
        (1, 2, "b", 30, 40),
        (1, 3, "a", 40, None),
        (2, 1, "x", 5, None),
    ]


def test_scd2_history_null_safe_change_detection(spark):
    # NULL -> NULL is NOT a change; NULL -> value is
    rows = [(1, None, 1), (1, None, 2), (1, "a", 3), (1, None, 4)]
    df = spark.createDataFrame(rows, "k int, attr string, seq int")
    out = scd2_history(df, keys=["k"], attr_cols=["attr"], seq_col="seq")
    got = sorted(
        (r["version"], r["attr"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert got == [(1, None, 1, 3), (2, "a", 3, 4), (3, None, 4, None)]


def test_scd2_history_multi_attr(spark):
    # change in EITHER attribute starts a version
    rows = [(1, "a", 1, 10), (1, "a", 2, 20), (1, "b", 2, 30)]
    df = spark.createDataFrame(rows, "k int, a1 string, a2 int, seq int")
    out = scd2_history(df, keys=["k"], attr_cols=["a1", "a2"], seq_col="seq")
    assert out.count() == 3


def test_scd2_single_shuffle_plan(spark):
    """The lag / running-sum windows share one (key) partitioning: the
    physical plan must contain exactly one Exchange below the first
    Window (the version-interval lead adds its own over the collapsed
    frame)."""
    rows = [(i % 7, str(i % 3), i) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, attr string, seq int")
    out = scd2_history(df, keys=["k"], attr_cols=["attr"], seq_col="seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exchanges: one hashpartitioning(k) for the event-level windows +
    # aggregate, one for the version-level lead — both on k, so AQE/
    # Catalyst reuse allows at most 2; anything more means a lost
    # partitioning
    assert plan.count("Exchange hashpartitioning") <= 2
