"""changepoint_split: exact-integer level-shift argmax."""

from omop2owl_vocab_spark.operators.timeseries import changepoint_split


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, t long, v long")
    return {
        r["k"]: (
            r["split_after"], r["n"], r["sum_left"],
            r["sum_total"], r["score_e6"],
        )
        for r in changepoint_split(df, ["k"], "t", "v").collect()
    }


def test_obvious_step(spark):
    # 0,0,0,10,10,10: best split after t=3 — means 0 vs 10, score 10e6
    rows = [("a", i, 0 if i <= 3 else 10) for i in range(1, 7)]
    got = _run(spark, rows)
    assert got["a"] == (3, 6, 0, 30, 10_000_000)


def test_flat_series_scores_zero_and_breaks_ties_early(spark):
    rows = [("f", i, 5) for i in range(1, 5)]
    got = _run(spark, rows)
    # every split scores 0; earliest split wins
    assert got["f"] == (1, 4, 5, 20, 0)


def test_single_point_key_dropped(spark):
    rows = [("s", 1, 9), ("m", 1, 1), ("m", 2, 3)]
    got = _run(spark, rows)
    assert "s" not in got
    # m: split after 1 — means 1 vs 3 -> score 2e6
    assert got["m"] == (1, 2, 1, 4, 2_000_000)


def test_exact_fraction_scoring(spark):
    # 1,2,9: split1 -> |1*2 - 11*1|/2 = 4.5 -> 4_500_000
    #        split2 -> |3*1 - 9*2|/2  = 7.5 -> 7_500_000 (argmax)
    rows = [("g", 1, 1), ("g", 2, 2), ("g", 3, 9)]
    got = _run(spark, rows)
    assert got["g"] == (2, 3, 3, 12, 7_500_000)
