"""dag_longest_levels (longest-path layering, cycle guard) and
neighbor_jaccard (structural similarity) on handcrafted graphs."""

import pytest

from omop2owl_vocab_spark.operators.graph import (
    dag_longest_levels,
    neighbor_jaccard,
)


def test_dag_levels_diamond(spark):
    #   1 -> 2 -> 4,  1 -> 3 -> 4, 4 -> 5 ; longest path to root wins
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (4, 3), (5, 4)], "child int, parent int"
    )
    got = {r["node"]: r["level"] for r in dag_longest_levels(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_dag_levels_shortcut_takes_max(spark):
    # 3 -> 2 -> 1 and the shortcut 3 -> 1: level(3) must be 2, not 1
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (3, 1)], "child int, parent int"
    )
    got = {r["node"]: r["level"] for r in dag_longest_levels(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_dag_levels_early_exit_and_multiroot(spark):
    # two components, depth 1 each — converges long before max_iter
    edges = spark.createDataFrame(
        [(2, 1), (20, 10)], "child int, parent int"
    )
    got = {r["node"]: r["level"] for r in dag_longest_levels(edges, 16).collect()}
    assert got == {1: 0, 2: 1, 10: 0, 20: 1}


def test_dag_levels_cycle_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "child int, parent int"
    )
    with pytest.raises(ValueError, match="did not converge"):
        dag_longest_levels(edges, max_iter=5)


def test_neighbor_jaccard_square(spark):
    # square 1-2-3-4-1: opposite corners share BOTH neighbors, J = 2/2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    got = {
        (r["node_a"], r["node_b"]): (r["common"], r["union_sz"], r["jaccard_e4"])
        for r in neighbor_jaccard(edges, threshold=0.0, min_common=1).collect()
    }
    assert got[(1, 3)] == (2, 2, 10000)
    assert got[(2, 4)] == (2, 2, 10000)
    # adjacent corners share nothing (no diagonal) — absent
    assert (1, 2) not in got


def test_neighbor_jaccard_threshold_and_min_common(spark):
    # star: hub 0 to leaves 1..4 — every leaf pair shares exactly {0}
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    all_pairs = neighbor_jaccard(edges, threshold=0.0, min_common=1).collect()
    assert len(all_pairs) == 6  # C(4,2) leaf pairs
    assert all(r["jaccard_e4"] == 10000 for r in all_pairs)
    assert neighbor_jaccard(edges, threshold=0.0, min_common=2).count() == 0


def test_neighbor_jaccard_duplicate_edges_collapse(spark):
    # parallel edges and both orientations must not inflate counts
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)], "src int, dst int"
    )
    got = {
        (r["node_a"], r["node_b"]): r["common"]
        for r in neighbor_jaccard(edges, threshold=0.0, min_common=1).collect()
    }
    assert got == {(1, 3): 1}
