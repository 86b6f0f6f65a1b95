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


def test_fuzzy_pairs_deletion_path_matches_quadratic(spark):
    """r6: max_dist=1 uses FastSS deletion-neighborhood candidates; the
    pair set and distances must equal the blocked-quadratic reference
    plan on a corpus with substitutions, insertions, deletions, exact
    dups, empty and NULL names, and NULL blocks."""
    from pyspark.sql import functions as F

    from omop2owl_vocab_spark.operators.resolve import _canon_name

    rows = [
        (1, "alpha", "b1"), (2, "alphb", "b1"), (3, "alph", "b1"),
        (4, "alphaa", "b1"), (5, "alpha", "b1"), (6, "beta", "b1"),
        (7, "alpha", "b2"), (8, "", "b1"), (9, "x", "b1"),
        (10, None, "b1"), (11, "alpha", None), (12, "ab", "b1"),
        (13, "ba", "b1"), (14, "a!lpha##", "b1"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, block string")
    fast = {
        (r["id_l"], r["id_r"], r["block"], r["dist"])
        for r in fuzzy_pairs(df, "id", "name", "block", max_dist=1).collect()
    }
    # reference: the generic blocked-quadratic plan (still the
    # max_dist>=2 code path), evaluated at threshold 1
    canon = df.select(
        F.col("id"), F.col("block"), _canon_name(F.col("name")).alias("nm")
    )
    a, b = canon.alias("a"), canon.alias("b")
    ref = {
        (r["id_l"], r["id_r"], r["block"], r["dist"])
        for r in a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.length("a.nm") - F.length("b.nm")) <= 1),
        )
        .select(
            F.col("a.id").alias("id_l"),
            F.col("b.id").alias("id_r"),
            F.col("a.block").alias("block"),
            F.levenshtein(F.col("a.nm"), F.col("b.nm"), 1)
            .cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") >= 0)
        .collect()
    }
    assert fast == ref
    # sanity: the corpus exercises every edit kind
    dists = {d for (_, _, _, d) in ref}
    assert dists == {0, 1}
