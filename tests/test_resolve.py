"""Blocked fuzzy matching (operators/resolve.py): canonicalization,
blocking, threshold semantics, and the join-only plan shape."""

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.resolve import (
    block_stats,
    fuzzy_join,
    fuzzy_pairs,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ACME Corp.", "us"),
            (2, "acme corp", "us"),
            (3, "Acme Korp", "us"),
            (4, "acme corp", "de"),
            (5, "zeta llc", "us"),
        ],
        "id long, name string, country string",
    )


def test_fuzzy_pairs_canon_block_threshold(spark):
    got = {
        (r["id_l"], r["id_r"]): r["dist"]
        for r in fuzzy_pairs(
            _df(spark), "id", "name", "country", max_dist=1
        ).collect()
    }
    # 1~2 identical after lower+punct-strip; 3 one edit away; 4 is in
    # another block despite an exact name; 5 is beyond the threshold.
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_fuzzy_pairs_each_pair_once_and_zero_dist(spark):
    df = _df(spark)
    rows = fuzzy_pairs(df, "id", "name", "country", max_dist=0).collect()
    assert [(r["id_l"], r["id_r"], r["dist"]) for r in rows] == [(1, 2, 0)]
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "name", "country", max_dist=-1)


def test_fuzzy_join_cross_table(spark):
    r = spark.createDataFrame(
        [(10, "acme korp", "us"), (11, "acme corp", "fr")],
        "rid long, rname string, rc string",
    )
    got = {
        (x["id_l"], x["id_r"]): x["dist"]
        for x in fuzzy_join(
            _df(spark), r, ("id", "rid"), ("name", "rname"),
            ("country", "rc"), max_dist=1,
        ).collect()
    }
    assert got == {(1, 10): 1, (2, 10): 1, (3, 10): 0}


def test_block_stats_pair_forecast(spark):
    got = [
        (r["block"], r["n_rows"], r["n_pairs"])
        for r in block_stats(_df(spark), "country").collect()
    ]
    assert got == [("us", 4, 6), ("de", 1, 0)]


def test_fuzzy_pairs_plan_join_only(spark):
    plan = (
        fuzzy_pairs(_df(spark), "id", "name", "country", max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one equi-join on the block key, no sort/window; the distance and
    # band filters ride the join, not a later stage
    assert plan.count("Join") >= 1
    assert "Window" not in plan
    assert "levenshtein" in plan


def test_fuzzy_pairs_string_ids(spark):
    # review regression: a cast("long") NULLed non-numeric ids and
    # silently returned zero pairs
    df = spark.createDataFrame(
        [("u-a", "acme corp", "us"), ("u-b", "acme korp", "us")],
        "id string, name string, country string",
    )
    got = [
        (r["id_l"], r["id_r"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name", "country", max_dist=1).collect()
    ]
    assert got == [("u-a", "u-b", 1)]
