"""interval_merge (island coalescing), rolling_median (exact trailing
order statistic), and linear_trend (exact OLS sufficient stats)."""

from omop2owl_vocab_spark.operators.stats import linear_trend
from omop2owl_vocab_spark.operators.timeseries import (
    interval_merge,
    rolling_median,
)


def test_interval_merge_islands(spark):
    # key a: [1,5) [3,7) [7,9) merge (touching joins); [20,25) alone
    # key b: nested [0,10) [2,3)
    rows = [
        ("a", 1, 5), ("a", 3, 7), ("a", 7, 9), ("a", 20, 25),
        ("b", 0, 10), ("b", 2, 3),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r["k"], r["island"]): (
            r["start"], r["end"], r["n_intervals"], r["covered"]
        )
        for r in interval_merge(df, ["k"], "s", "e").collect()
    }
    assert got == {
        ("a", 1): (1, 9, 3, 8),
        ("a", 2): (20, 25, 1, 5),
        ("b", 1): (0, 10, 2, 10),
    }


def test_interval_merge_running_max_not_lag(spark):
    # [0,100) swallows [1,2) and [3,4): a lag-based (previous row only)
    # implementation would wrongly split at [3,4)
    rows = [("k", 0, 100), ("k", 1, 2), ("k", 3, 4)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = interval_merge(df, ["k"], "s", "e").collect()
    assert len(out) == 1 and out[0]["n_intervals"] == 3


def test_rolling_median_exact(spark):
    rows = [("u", i, v) for i, v in enumerate([10, 2, 8, 100, 4])]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        r["t"]: (r["med"], r["n_window"])
        for r in rolling_median(df, ["k"], "t", "v", window_rows=3).collect()
    }
    # windows: [10] [2,10] [2,8,10] [8,100,2]->8 [8,100,4]->8
    assert got == {
        0: (10, 1), 1: (2, 2), 2: (8, 3), 3: (8, 3), 4: (8, 3)
    }


def test_linear_trend_exact_fraction(spark):
    # y = 3x + 1 exactly: slope fraction must be (3*sxx)/sxx
    rows = [("g", x, 3 * x + 1) for x in range(10)]
    # plus a noisy group with known sums: x=[0,1,2], y=[0,0,3]
    rows += [("h", 0, 0), ("h", 1, 0), ("h", 2, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n"], r["sum_x"], r["sum_y"], r["sxy_num"], r["sxx_num"])
        for r in linear_trend(df, ["g"], "x", "y").collect()
    }
    n, sx = 10, 45
    sxx = sum(x * x for x in range(10))
    assert got["g"][3] == 3 * (n * sxx - sx * sx)
    assert got["g"][4] == n * sxx - sx * sx
    # h: n=3 sx=3 sy=3 sxy=6 sxx=5 -> sxy_num=3*6-9=9, sxx_num=15-9=6
    assert got["h"] == (3, 3, 3, 9, 6)


def test_linear_trend_null_exclusion(spark):
    rows = [("g", 1, 2), ("g", None, 9), ("g", 3, None), ("g", 2, 4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = linear_trend(df, ["g"], "x", "y").collect()[0]
    assert (r["n"], r["sum_x"], r["sum_y"]) == (2, 3, 6)
