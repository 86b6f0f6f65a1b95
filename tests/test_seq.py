"""Per-group sequential DP via applyInPandas (operators/seq.py)."""

from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.seq import lis_per_group


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, value double, sec long"
    ).select(
        "user_id", "event_id", "value",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )


def test_lis_hand_computed(spark):
    ev = _ev(spark, [
        (1, 1, 3.0, 0), (1, 2, 1.0, 1), (1, 3, 2.0, 2),
        (1, 4, 5.0, 3), (1, 5, 4.0, 4),
        (2, 6, 7.0, 0), (2, 7, 7.0, 1),   # tie: NOT strictly increasing
        (3, 8, 9.0, 0),
    ])
    got = {
        r["user_id"]: (r["n_events"], r["lis_len"])
        for r in lis_per_group(ev).collect()
    }
    assert got == {1: (5, 3), 2: (2, 1), 3: (1, 1)}


def test_lis_order_is_ts_then_id(spark):
    # equal timestamps: event_id orders -> values 1,2,3 (lis 3);
    # if id order were violated the sequence 2,1,3 would give 2
    ev = _ev(spark, [
        (1, 10, 2.0, 5), (1, 9, 1.0, 5), (1, 11, 3.0, 5),
    ])
    row = lis_per_group(ev).collect()[0]
    assert (row["n_events"], row["lis_len"]) == (3, 3)


def test_lis_descending_and_partition_invariance(spark):
    rows = [(1, i, float(100 - i), i) for i in range(1, 31)]
    ev = _ev(spark, rows)
    assert lis_per_group(ev).collect()[0]["lis_len"] == 1
    got = lis_per_group(ev.repartition(7)).collect()[0]
    assert (got["n_events"], got["lis_len"]) == (30, 1)


def test_lis_string_group_keys(spark):
    # review regression: cast("long") merged non-numeric keys into one
    # NULL group
    ev = spark.createDataFrame(
        [("ua", 1, 1.0, 0), ("ua", 2, 2.0, 1), ("ub", 3, 5.0, 0)],
        "user_id string, event_id long, value double, sec long",
    ).select(
        "user_id", "event_id", "value",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    got = {
        r["user_id"]: r["lis_len"] for r in lis_per_group(ev).collect()
    }
    assert got == {"ua": 2, "ub": 1}
