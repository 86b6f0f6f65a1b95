"""max_concurrency (sweep-line peak, touching intervals, peak_at) and
cumulative_distinct (discovery curve) semantics."""

from omop2owl_vocab_spark.operators.timeseries import (
    cumulative_distinct,
    max_concurrency,
)


def test_max_concurrency_basic_overlap(spark):
    # key a: [0,10) [5,15) [12,20) -> peak 2 first reached at t=5
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 12, 20), ("b", 0, 1)],
        "k string, s long, e long",
    )
    got = {
        r["k"]: (r["peak"], r["peak_at"])
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == {"a": (2, 5), "b": (1, 0)}


def test_max_concurrency_touching_intervals_do_not_stack(spark):
    # [0,5) then [5,10): the end at 5 sorts before the start at 5
    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 5, 10)], "k string, s long, e long"
    )
    got = max_concurrency(df, ["k"], "s", "e").collect()[0]
    assert got["peak"] == 1 and got["peak_at"] == 0


def test_max_concurrency_triple_stack_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 0, 100), ("a", 10, 100), ("a", 20, 100),
         ("a", None, 5), ("a", 7, None)],
        "k string, s long, e long",
    )
    got = max_concurrency(df, ["k"], "s", "e").collect()[0]
    assert got["peak"] == 3 and got["peak_at"] == 20


def test_cumulative_distinct_curve(spark):
    rows = [
        ("u", 1, "x"), ("u", 2, "y"), ("u", 3, "x"),
        ("u", 4, "z"), ("u", 5, "y"),
        ("v", 6, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, item string")
    out = cumulative_distinct(df, ["k"], "item", ["seq"])
    got = {(r["k"], r["seq"]): r["n_seen"] for r in out.collect()}
    assert got == {
        ("u", 1): 1, ("u", 2): 2, ("u", 3): 2,
        ("u", 4): 3, ("u", 5): 3, ("v", 6): 1,
    }
    assert out.count() == len(rows)  # one output row per input row
