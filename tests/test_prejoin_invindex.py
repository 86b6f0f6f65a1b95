"""bucket_prefilter_semi_join (== plain semi join, broadcast sketch
plan) and inverted_index postings/df/tf semantics."""

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.prejoin import bucket_prefilter_semi_join
from omop2owl_vocab_spark.operators.text import inverted_index


def test_bucket_prefilter_equals_semi_join(spark):
    big = spark.createDataFrame(
        [(i, i % 10) for i in range(500)], "id long, k long"
    )
    small = spark.createDataFrame([(2,), (7,), (99,)], "sk long")
    got = bucket_prefilter_semi_join(big, small, on=[("k", "sk")])
    want = big.join(small, big.k == small.sk, "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucket_prefilter_collisions_are_removed(spark):
    """n_buckets=1: every row passes the sketch, the exact stage must
    still produce the precise semi join."""
    big = spark.createDataFrame([(i,) for i in range(100)], "k long")
    small = spark.createDataFrame([(5,), (50,)], "sk long")
    got = bucket_prefilter_semi_join(big, small, on=[("k", "sk")], n_buckets=1)
    assert sorted(r["k"] for r in got.collect()) == [5, 50]


def test_bucket_prefilter_multi_column_key(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)], "x long, y string, v long"
    )
    small = spark.createDataFrame([(1, "a"), (2, "b")], "sx long, sy string")
    got = bucket_prefilter_semi_join(
        big, small, on=[("x", "sx"), ("y", "sy")]
    )
    assert [tuple(r) for r in got.collect()] == [(1, "a", 10)]


def test_bucket_prefilter_plan_shapes(spark):
    """Stage 1 must be a BroadcastHashJoin on the sketch (no shuffle of
    the big side before it)."""
    big = spark.createDataFrame([(i,) for i in range(100)], "k long")
    small = spark.createDataFrame([(5,)], "sk long")
    plan = (
        bucket_prefilter_semi_join(big, small, on=[("k", "sk")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bucket_prefilter_validates_on(spark):
    big = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="join column"):
        bucket_prefilter_semi_join(big, big, on=[])


def test_inverted_index_semantics(spark):
    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "banana cherry"),
            (2, "Apple cherry cherry"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["tf_sum"], r["postings"])
        for r in inverted_index(docs).collect()
    }
    # case-folded; df counts docs, tf_sum counts occurrences;
    # postings sorted ascending regardless of input order
    assert got["apple"] == (2, 3, "2|3")
    assert got["banana"] == (2, 2, "1|3")
    assert got["cherry"] == (2, 3, "1|2")


def test_inverted_index_caps_postings_and_min_df(spark):
    docs = spark.createDataFrame(
        [(i, "common") for i in range(30)] + [(99, "rare")],
        "doc_id long, text string",
    )
    got = {
        r["term"]: r for r in inverted_index(docs, max_postings=5).collect()
    }
    assert got["common"]["df"] == 30
    assert got["common"]["postings"] == "0|1|2|3|4"
    out = inverted_index(docs, min_df=2)
    assert [r["term"] for r in out.collect()] == ["common"]
