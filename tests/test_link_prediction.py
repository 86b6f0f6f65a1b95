"""link_prediction: common-neighbor ranking of non-adjacent pairs
with preferential-attachment tie-break under a total order."""

from omop2owl_vocab_spark.operators.graph import link_prediction


def test_square_predicts_diagonals(spark):
    # 4-cycle 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) each share
    # two neighbors; adjacent pairs must never appear
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    rows = [tuple(r) for r in link_prediction(edges, top_k=10).collect()]
    assert rows == [(1, 3, 2, 4), (2, 4, 2, 4)]


def test_total_order_and_top_k(spark):
    # star center 0 with leaves 1..4: all leaf pairs share exactly the
    # center; pa equal -> node-pair ordering decides; top_k truncates
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    rows = [tuple(r) for r in link_prediction(edges, top_k=3).collect()]
    assert rows == [(1, 2, 1, 1), (1, 3, 1, 1), (1, 4, 1, 1)]


def test_direction_and_duplicates_collapse(spark):
    # same graph expressed with reversed/duplicate edges gives the
    # same predictions
    base = [(1, 2), (2, 3), (3, 4), (4, 1)]
    noisy = base + [(b, a) for a, b in base] + base
    e1 = spark.createDataFrame(base, "src long, dst long")
    e2 = spark.createDataFrame(noisy, "src long, dst long")
    assert (
        [tuple(r) for r in link_prediction(e1, top_k=10).collect()]
        == [tuple(r) for r in link_prediction(e2, top_k=10).collect()]
    )
