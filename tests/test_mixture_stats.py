"""Unit tests for deterministic mixture resampling
(`operators/sample.py:mixture_sample`) and exact nearest-rank group
quantiles (`operators/stats.py:group_quantiles`)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.sample import mixture_sample
from omop2owl_vocab_spark.operators.stats import group_quantiles

_HEX = 16**15


def _u(seed: int, doc_id: int) -> int:
    return int(
        hashlib.md5(f"mix{seed}:{doc_id}".encode()).hexdigest()[:15], 16
    )


def _docs(spark, n, sources=("a", "b")):
    return spark.createDataFrame(
        [(i, sources[i % len(sources)]) for i in range(n)],
        ["doc_id", "source"],
    )


def test_mixture_downsample_matches_python_reference(spark):
    df = _docs(spark, 400, ("a",))
    out = mixture_sample(df, {"a": 0.25}, seed=7).collect()
    thr = int(round(0.25 * _HEX))
    expect = {i for i in range(400) if _u(7, i) < thr}
    assert {r["doc_id"] for r in out} == expect
    assert all(r["copy_id"] == 0 for r in out)
    # rate is honored in aggregate (±4/sqrt(n·p) tolerance)
    assert abs(len(out) - 100) < 40


def test_mixture_upsample_copies(spark):
    df = _docs(spark, 300, ("a",))
    out = mixture_sample(df, {"a": 2.5}, seed=1).collect()
    thr = int(round(0.5 * _HEX))
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r["copy_id"])
    for i in range(300):
        want = 3 if _u(1, i) < thr else 2
        assert sorted(by_id[i]) == list(range(want)), i


def test_mixture_default_rate_and_validation(spark):
    df = _docs(spark, 100, ("a", "z"))
    out = mixture_sample(df, {"a": 1.0}, seed=0).collect()
    # default_rate=0: unlisted source 'z' dropped entirely, 'a' kept 1×
    assert {r["source"] for r in out} == {"a"}
    assert len(out) == 50
    out2 = mixture_sample(df, {"a": 1.0}, seed=0, default_rate=1.0)
    assert out2.count() == 100
    with pytest.raises(ValueError):
        mixture_sample(df, {"a": -0.1})


def test_mixture_partitioning_invariance(spark):
    df = _docs(spark, 500)
    rates = {"a": 0.3, "b": 1.7}
    r1 = sorted(
        (r["doc_id"], r["copy_id"])
        for r in mixture_sample(df, rates, seed=3).collect()
    )
    r2 = sorted(
        (r["doc_id"], r["copy_id"])
        for r in mixture_sample(
            df.repartition(13, "doc_id"), rates, seed=3
        ).collect()
    )
    assert r1 == r2
    # different seed re-deals
    r3 = sorted(
        (r["doc_id"], r["copy_id"])
        for r in mixture_sample(df, rates, seed=4).collect()
    )
    assert r1 != r3


def test_mixture_no_shuffle_plan(spark):
    df = _docs(spark, 50)
    out = mixture_sample(df, {"a": 0.5, "b": 2.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow projection + explode only


# ---------------------------------------------------------- group_quantiles


def test_quantiles_hand_computed(spark):
    df = spark.createDataFrame(
        [("g", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]],
        ["g", "v"],
    )
    row = group_quantiles(df, ["g"], "v", (50, 90, 99)).collect()[0]
    # nearest rank: idx = ceil(p*n/100) → p50 = 5th = 50, p90 = 9th = 90,
    # p99 = ceil(9.9) = 10th = 100 (NOT the float-rounded 0.9·10 trap)
    assert (row["n"], row["min"], row["max"]) == (10, 10, 100)
    assert (row["p50"], row["p90"], row["p99"]) == (50, 90, 100)


def test_quantiles_single_value_and_ties(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 1), ("b", 1), ("b", 2)], ["g", "v"]
    )
    got = {
        r["g"]: r for r in group_quantiles(df, ["g"], "v", (50,)).collect()
    }
    assert got["a"]["p50"] == 5 and got["a"]["n"] == 1
    # multiset semantics: b sorted = [1,1,2], idx = ceil(1.5)=2 → 1
    assert got["b"]["p50"] == 1


def test_quantiles_p100_is_max_and_validation(spark):
    df = spark.createDataFrame([("g", v) for v in range(1, 8)], ["g", "v"])
    row = group_quantiles(df, ["g"], "v", (1, 100)).collect()[0]
    assert row["p1"] == 1 and row["p100"] == 7 == row["max"]
    with pytest.raises(ValueError):
        group_quantiles(df, [], "v")
    with pytest.raises(ValueError):
        group_quantiles(df, ["g"], "v", (0,))
    with pytest.raises(ValueError):
        group_quantiles(df, ["g"], "v", (101,))


def test_quantiles_single_window_plan(spark):
    df = spark.createDataFrame([("g", v) for v in range(20)], ["g", "v"])
    out = group_quantiles(df, ["g"], "v")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # the two window functions (row_number + count) share ONE exchange
    # and ONE sort — the quantile pass reads and sorts each group once
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1


def test_mad_outliers_hand_computed(spark):
    from omop2owl_vocab_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("b", 5.0)],
        "g string, v double",
    )
    got = {
        r["g"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in mad_outliers(df, ["g"], "v").collect()
    }
    # a: med=3 (rank ceil(5/2)=3 of 1,2,3,4,100); devs sorted
    # 0,1,1,2,97 -> mad=1; fence 3*1 -> only 97 exceeds.
    # b: singleton -> mad=0, dev=0 is NOT > 0 -> no outlier.
    assert got == {"a": (5, 3.0, 1.0, 1), "b": (1, 5.0, 0.0, 0)}


def test_mad_outliers_zero_mad_flags_any_deviation(spark):
    from omop2owl_vocab_spark.operators.stats import mad_outliers

    # majority identical -> mad=0 -> every deviating row is an outlier
    df = spark.createDataFrame(
        [("g", 7.0), ("g", 7.0), ("g", 7.0), ("g", 7.5), ("g", 6.0)],
        "g string, v double",
    )
    row = mad_outliers(df, ["g"], "v").collect()[0]
    assert (row["med"], row["mad"], row["n_outliers"]) == (7.0, 0.0, 2)


def test_mad_outliers_even_group_lower_median(spark):
    from omop2owl_vocab_spark.operators.stats import mad_outliers

    # n=4 -> median rank (50*4+99) div 100 = 2 (LOWER median)
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)],
        "g string, v double",
    )
    row = mad_outliers(df, ["g"], "v").collect()[0]
    # med=2; devs 1,0,1,2 sorted 0,1,1,2 -> mad at rank 2 = 1
    assert (row["n"], row["med"], row["mad"], row["n_outliers"]) == (4, 2.0, 1.0, 0)


def test_mad_outliers_validation(spark):
    import pytest as _pt
    from omop2owl_vocab_spark.operators.stats import mad_outliers

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with _pt.raises(ValueError):
        mad_outliers(df, [], "v")
    with _pt.raises(ValueError):
        mad_outliers(df, ["g"], "v", k_e2=0)


def test_equal_freq_bins_ceil_first_buckets(spark):
    from omop2owl_vocab_spark.operators.stats import equal_freq_bins

    # 7 rows into 3 bins -> sizes 3,2,2 (first n%bins buckets get ceil)
    df = spark.createDataFrame(
        [("g", float(v)) for v in [5, 1, 3, 7, 2, 6, 4]],
        "g string, v double",
    )
    got = {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in equal_freq_bins(df, ["g"], "v", n_bins=3).collect()
    }
    assert got == {
        1: (3, 1.0, 3.0), 2: (2, 4.0, 5.0), 3: (2, 6.0, 7.0),
    }


def test_equal_freq_bins_ties_and_validation(spark):
    from omop2owl_vocab_spark.operators.stats import equal_freq_bins

    # straddling ties: [1,1,1,1] into 2 bins -> both bins all-ones
    df = spark.createDataFrame(
        [("g", 1.0)] * 4, "g string, v double"
    )
    got = {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in equal_freq_bins(df, ["g"], "v", n_bins=2).collect()
    }
    assert got == {1: (2, 1.0, 1.0), 2: (2, 1.0, 1.0)}
    import pytest as _pt
    with _pt.raises(ValueError):
        equal_freq_bins(df, [], "v")
    with _pt.raises(ValueError):
        equal_freq_bins(df, ["g"], "v", n_bins=0)


def test_pps_sample_certain_rows_and_determinism(spark):
    from omop2owl_vocab_spark.operators.sample import pps_sample

    # one row carries >= W/k of the weight -> always kept
    df = spark.createDataFrame(
        [(1, 1_000_000)] + [(i, 1) for i in range(2, 102)],
        "doc_id long, w long",
    )
    s1 = {r["doc_id"] for r in pps_sample(df, "w", k=5, seed=3).collect()}
    s2 = {r["doc_id"] for r in pps_sample(df, "w", k=5, seed=3).collect()}
    assert 1 in s1 and s1 == s2
    # tiny-weight rows: inclusion prob ~ 5/1e6 each -> none expected
    assert len(s1 - {1}) <= 2
    import pytest as _pt
    with _pt.raises(ValueError):
        pps_sample(df, "w", k=0)


def test_pps_sample_python_reference(spark):
    import hashlib
    from omop2owl_vocab_spark.operators.sample import pps_sample

    rows = [(i, (i * 37) % 100 + 1) for i in range(1, 201)]
    W = sum(w for _, w in rows)
    k, seed = 20, 9
    expect = set()
    for i, w in rows:
        draw = int(hashlib.md5(f"pps{seed}:{i}".encode()).hexdigest()[:15], 16)
        if draw * W < w * (k << 60):
            expect.add(i)
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in pps_sample(df, "w", k=k, seed=seed).collect()}
    assert got == expect and len(got) > 0


def test_mad_outliers_and_quantiles_exclude_nulls(spark):
    from omop2owl_vocab_spark.operators.stats import (
        equal_freq_bins, group_quantiles, mad_outliers,
    )

    # review regression: NULLs sort FIRST in Spark windows — inside the
    # rank arithmetic they shifted the selected median (or nulled it)
    df = spark.createDataFrame(
        [("g", None), ("g", 1.0), ("g", 2.0), ("g", 3.0)],
        "g string, v double",
    )
    row = mad_outliers(df, ["g"], "v").collect()[0]
    assert (row["n"], row["med"]) == (3, 2.0)
    q = group_quantiles(df, ["g"], "v", percents=(50,)).collect()[0]
    assert (q["n"], q["p50"], q["min"]) == (3, 2.0, 1.0)
    bins = {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in equal_freq_bins(df, ["g"], "v", n_bins=3).collect()
    }
    assert bins == {1: (1, 1.0, 1.0), 2: (1, 2.0, 2.0), 3: (1, 3.0, 3.0)}
