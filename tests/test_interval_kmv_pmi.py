"""Unit tests for the round-5 additions: point-in-interval join
(`operators/asof.py:interval_join`), KMV distinct sketch
(`operators/sketch.py`), and bigram PMI collocations
(`operators/text.py:bigram_pmi`).  Semantics pinned on crafted
micro-data; the DuckDB hash-exact gate covers the same operators at
sf0.01 via `__spark_entry__.py`.
"""

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.asof import interval_join
from omop2owl_vocab_spark.operators.sketch import kmv_distinct
from omop2owl_vocab_spark.operators.text import bigram_pmi


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


# ---------------------------------------------------------- interval_join


def _pts(spark, rows):
    return spark.createDataFrame(rows, ["pid", "k", "ts"])


def _ivs(spark, rows):
    return spark.createDataFrame(rows, ["iid", "k", "start", "end"])


GRAINS_US = [1_000_000, 7_000_000, 3_600_000_000]


@pytest.mark.parametrize("grain", GRAINS_US)
def test_interval_join_half_open_and_grain_independent(spark, grain):
    pts = _pts(spark, [(1, "a", _ts(5)), (2, "a", _ts(10)),
                       (3, "a", _ts(0)), (4, "b", _ts(5))])
    ivs = _ivs(spark, [(100, "a", _ts(5), _ts(10)),   # [5,10): pid 1 only
                       (101, "a", _ts(0), _ts(6)),    # [0,6): pids 3,1
                       (102, "b", _ts(0), _ts(4))])   # [0,4): nothing
    out = interval_join(pts, ivs, point_ts="ts", start_ts="start",
                        end_ts="end", on="k", grain_us=grain)
    got = sorted((r["pid"], r["iv_iid"]) for r in out.collect())
    # half-open: ts=10 not in [5,10); ts=5 IS in [5,10); key b isolated
    assert got == [(1, 100), (1, 101), (3, 101)]


def test_interval_join_exactly_once_across_bucket_boundaries(spark):
    # interval spans many grains; point must match exactly once
    pts = _pts(spark, [(1, "a", _ts(50))])
    ivs = _ivs(spark, [(100, "a", _ts(0), _ts(100))])
    out = interval_join(pts, ivs, on="k", grain_us=1_000_000)
    assert [(r["pid"], r["iv_iid"]) for r in out.collect()] == [(1, 100)]


def test_interval_join_left_keeps_unmatched_points(spark):
    pts = _pts(spark, [(1, "a", _ts(5)), (2, "a", _ts(99))])
    ivs = _ivs(spark, [(100, "a", _ts(5), _ts(6))])
    out = interval_join(pts, ivs, on="k", grain_us=1_000_000, how="left")
    got = {r["pid"]: r["iv_iid"] for r in out.collect()}
    assert got == {1: 100, 2: None}


def test_interval_join_overlapping_intervals_all_match(spark):
    pts = _pts(spark, [(1, "a", _ts(5))])
    ivs = _ivs(spark, [(100, "a", _ts(0), _ts(10)),
                       (101, "a", _ts(4), _ts(6)),
                       (102, "a", _ts(5), _ts(5))])  # empty [5,5) dropped
    out = interval_join(pts, ivs, on="k", grain_us=2_000_000)
    assert sorted(r["iv_iid"] for r in out.collect()) == [100, 101]


def test_interval_join_global_no_key(spark):
    pts = spark.createDataFrame([(1, _ts(5))], ["pid", "ts"])
    ivs = spark.createDataFrame([(100, _ts(0), _ts(10)),
                                 (101, _ts(6), _ts(10))],
                                ["iid", "start", "end"])
    out = interval_join(pts, ivs, grain_us=1_000_000)
    assert sorted(r["iv_iid"] for r in out.collect()) == [100]
    with pytest.raises(ValueError):
        interval_join(pts, ivs, grain_us=0)
    with pytest.raises(ValueError):
        interval_join(pts, ivs, how="outer")


# ----------------------------------------------------------- kmv_distinct


def _kmv_frac(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_kmv_small_group_exact_path(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 7}") for i in range(100)], ["g", "v"]
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    # 7 distinct < k → exact: n_kept is the true cardinality
    assert row["n_kept"] == 7
    assert row["kth_hash"] is None
    assert row["distinct_e4"] == 7 * 10000


def test_kmv_estimator_matches_python_reference(spark):
    vals = [f"item-{i}" for i in range(5000)]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    k = 64
    row = kmv_distinct(df, ["g"], "v", k=k).collect()[0]
    kth = sorted(_kmv_frac(v) for v in set(vals))[k - 1]
    assert row["n_kept"] == k
    assert row["kth_hash"] == kth
    expect = math.floor((k - 1) * float(16**15) / float(kth) * 10000 + 0.5)
    assert row["distinct_e4"] == expect
    # the estimate is within the ~1/sqrt(k-2) ballpark of the truth
    est = row["distinct_e4"] / 10000
    assert abs(est - 5000) / 5000 < 4 / math.sqrt(k - 2)


def test_kmv_duplicates_do_not_move_the_sketch(spark):
    base = [("g", f"x{i}") for i in range(500)]
    df1 = spark.createDataFrame(base, ["g", "v"])
    df2 = spark.createDataFrame(base * 3, ["g", "v"])  # same distinct set
    r1 = kmv_distinct(df1, ["g"], "v", k=16).collect()[0]
    r2 = kmv_distinct(df2, ["g"], "v", k=16).collect()[0]
    assert (r1["kth_hash"], r1["distinct_e4"]) == (
        r2["kth_hash"], r2["distinct_e4"]
    )


def test_kmv_multiple_groups_and_validation(spark):
    df = spark.createDataFrame(
        [("a", f"v{i}") for i in range(10)]
        + [("b", f"v{i}") for i in range(200)],
        ["g", "v"],
    )
    got = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=32).collect()}
    assert got["a"]["n_kept"] == 10 and got["a"]["distinct_e4"] == 100000
    assert got["b"]["n_kept"] == 32 and got["b"]["kth_hash"] is not None
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=2)
    with pytest.raises(ValueError):
        kmv_distinct(df, [], "v")


# ------------------------------------------------------------- bigram_pmi


def test_bigram_pmi_hand_computed(spark):
    # corpus: "new york" occurs 3×, unigrams new=3 york=3, N=10
    docs = spark.createDataFrame(
        [(1, "new york new york"), (2, "new york is big"), (3, "big is")],
        ["doc_id", "text"],
    )
    rows = bigram_pmi(docs, min_count=2, top_m=10).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    ny = got[("new", "york")]
    assert ny["c_xy"] == 3 and ny["c_x"] == 3 and ny["c_y"] == 3
    assert ny["n_tokens"] == 10
    assert ny["pmi_ratio_e4"] == (3 * 10 * 10000) // (3 * 3)  # 33333


def test_bigram_pmi_rank_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c d c d x x")], ["doc_id", "text"]
    )
    rows = bigram_pmi(docs, min_count=1, top_m=3).collect()
    # ratios: ("a","b")=2N/(2·2), ("c","d")=2N/(2·2) tie → w1 asc;
    # the single-occurrence cross bigrams score lower
    assert [(r["w1"], r["w2"]) for r in rows[:2]] == [("a", "b"), ("c", "d")]
    assert rows[0]["pmi_ratio_e4"] == rows[1]["pmi_ratio_e4"]


def test_bigram_pmi_case_fold_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "Foo Bar foo bar baz qux")], ["doc_id", "text"]
    )
    rows = bigram_pmi(docs, min_count=2, top_m=10).collect()
    assert [(r["w1"], r["w2"], r["c_xy"]) for r in rows] == [
        ("foo", "bar", 2)
    ]
    with pytest.raises(ValueError):
        bigram_pmi(docs, min_count=0)
    with pytest.raises(ValueError):
        bigram_pmi(docs, top_m=0)


def test_bigram_pmi_plan_top_m_is_take_ordered(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = bigram_pmi(docs, min_count=1, top_m=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_interval_join_plan_is_hash_equi_join(spark):
    pts = _pts(spark, [(1, "a", _ts(5))])
    ivs = _ivs(spark, [(100, "a", _ts(0), _ts(10))])
    out = interval_join(pts, ivs, on="k", grain_us=1_000_000)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # the grain bucketing turns the range join into a HASH equi-join on
    # (key, bucket) with the exact range predicate as join condition —
    # never a BroadcastNestedLoopJoin / cartesian
    assert "HashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmv_plan_has_partial_window_group_limit(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(300)], ["g", "v"]
    )
    out = kmv_distinct(df, ["g"], "v", k=16)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # the rank<=k filter is planted as a PARTIAL WindowGroupLimit before
    # the shuffle: each map task forwards at most k rows per group, so
    # the exchange carries O(groups*k), not O(distinct)
    assert "WindowGroupLimit" in plan and "Partial" in plan
