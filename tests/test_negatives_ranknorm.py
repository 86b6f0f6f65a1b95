"""cyclic_negatives (no self-pairs, coverage, determinism, small-bucket
wrap) and rank_normalize (exact e4 percent ranks, ties, NULLs)."""

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.sample import cyclic_negatives
from omop2owl_vocab_spark.operators.stats import rank_normalize


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_negatives_basic_properties(spark):
    out = cyclic_negatives(_ids(spark, 100), k=3, n_buckets=8).collect()
    by_doc = {}
    for r in out:
        assert r["neg_id"] != r["doc_id"]
        by_doc.setdefault(r["doc_id"], []).append((r["j"], r["neg_id"]))
    # every doc gets exactly k partners (buckets are large enough here)
    assert set(by_doc) == set(range(100))
    assert all(len(v) == 3 for v in by_doc.values())


def test_negatives_single_item_bucket_empty(spark):
    # one row -> its bucket has size 1 -> no valid partner
    out = cyclic_negatives(_ids(spark, 1), k=3)
    assert out.count() == 0


def test_negatives_small_bucket_wraps_with_distinct_j(spark):
    # 2 items in one bucket, k=3: partner always the other item,
    # j=2 would self-pair (filtered), so each doc gets j in {1, 3}
    df = _ids(spark, 2)
    out = cyclic_negatives(
        df, k=3, bucket_col=F.lit(0)
    ).collect()
    got = sorted((r["doc_id"], r["j"], r["neg_id"]) for r in out)
    assert got == [(0, 1, 1), (0, 3, 1), (1, 1, 0), (1, 3, 0)]


def test_negatives_deterministic(spark):
    a = sorted(map(tuple, cyclic_negatives(_ids(spark, 64), k=2).collect()))
    b = sorted(map(tuple, cyclic_negatives(_ids(spark, 64), k=2).collect()))
    assert a == b


def test_negatives_validates_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        cyclic_negatives(_ids(spark, 4), k=0)


def test_rank_normalize_exact_values(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 20), ("g", 30), ("g", 40), ("g", 50)],
        "grp string, v long",
    )
    got = sorted(
        (r["v"], r["pct_rank_e4"])
        for r in rank_normalize(df, ["grp"], "v").collect()
    )
    assert got == [(10, 0), (20, 2500), (30, 5000), (40, 7500), (50, 10000)]


def test_rank_normalize_ties_and_singleton(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("a", 9), ("solo", 7)], "grp string, v long"
    )
    got = {
        (r["grp"], r["v"], i): r["pct_rank_e4"]
        for i, r in enumerate(
            sorted(
                rank_normalize(df, ["grp"], "v").collect(),
                key=lambda r: (r["grp"], r["v"]),
            )
        )
    }
    vals = sorted(
        (g, v, p) for (g, v, _), p in got.items()
    )
    # ties share rank 0; max of group a is rank 2 of n1=2 -> 10000
    assert vals == [("a", 5, 0), ("a", 5, 0), ("a", 9, 10000),
                    ("solo", 7, 0)]


def test_rank_normalize_drops_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 3)], "grp string, v long"
    )
    out = rank_normalize(df, ["grp"], "v").collect()
    assert sorted((r["v"], r["pct_rank_e4"]) for r in out) == [
        (1, 0),
        (3, 10000),
    ]
