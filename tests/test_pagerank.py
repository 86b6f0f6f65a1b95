"""Unit tests for fixed-iteration integer PageRank
(`operators/graph.py:pagerank_fixed`) against a pure-Python replay of
the identical integer recurrence."""

import pytest

from omop2owl_vocab_spark.operators.graph import pagerank_fixed

SCALE = 10**9


def _py_pagerank(edges, iterations=5, damping_pct=85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (100 - damping_pct) * SCALE // 100
    r = {n: SCALE for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: base + damping_pct * s[n] // 100 for n in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        row["node"]: row["rank_e9"]
        for row in pagerank_fixed(df, **kw).collect()
    }


def test_pagerank_matches_python_replay(spark):
    # cycle + funnel + dangling sink (4 has no out-edges)
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (5, 4)]
    got = _run(spark, edges)
    assert got == _py_pagerank(edges)
    # the sink with 4 in-edges outranks everyone
    assert got[4] == max(got.values())
    # dangling source 5 receives nothing but base mass after round 1
    assert got[5] == (100 - 85) * SCALE // 100


def test_pagerank_parallel_edges_collapse(spark):
    got_dup = _run(spark, [(1, 2), (1, 2), (2, 1)])
    got_one = _run(spark, [(1, 2), (2, 1)])
    assert got_dup == got_one


def test_pagerank_damping_zero_is_uniform_base(spark):
    got = _run(spark, [(1, 2), (2, 3)], damping_pct=0)
    assert set(got.values()) == {SCALE}


def test_pagerank_self_loop_retains_mass(spark):
    edges = [(1, 1), (2, 1)]
    got = _run(spark, edges)
    assert got == _py_pagerank(edges)
    assert got[1] > got[2]


def test_pagerank_validates_args(spark):
    import pyspark.sql.functions as F  # noqa: F401

    df_edges = [(1, 2)]
    with pytest.raises(ValueError):
        _run(spark, df_edges, iterations=0)
    with pytest.raises(ValueError):
        _run(spark, df_edges, damping_pct=101)


# ---------------------------------------------------------- triangle count


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    from omop2owl_vocab_spark.operators.graph import triangle_count

    return triangle_count(df).collect()[0]["n_triangles"]


def test_triangle_basic_and_dedup(spark):
    # one triangle; duplicate/reversed/self edges must not change it
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (1, 2), (1, 1)]
    assert _tri(spark, edges) == 1


def test_triangle_k4_has_four(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    assert _tri(spark, edges) == 4


def test_triangle_star_has_none(spark):
    assert _tri(spark, [(0, i) for i in range(1, 6)]) == 0


def test_triangle_hub_bounded(spark):
    # hub 0 connected to a 20-cycle: triangles = 20 (each cycle edge
    # closes with the hub); exercises the degree-orientation path where
    # the hub is always the HIGH endpoint
    n = 20
    edges = [(0, i) for i in range(1, n + 1)] + [
        (i, i % n + 1) for i in range(1, n + 1)
    ]
    assert _tri(spark, edges) == n


def test_degree_distribution_multiplicity_and_directions(spark):
    from omop2owl_vocab_spark.operators.graph import degree_distribution

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 2), (2, 3)], "src long, dst long"
    )
    got = {
        (r["direction"], r["degree"]): r["n_nodes"]
        for r in degree_distribution(e).collect()
    }
    # out: node1 deg3 (parallel edge counts), node2 deg1
    # in: nodes 2 and 3 both deg2
    assert got == {("out", 3): 1, ("out", 1): 1, ("in", 2): 2}


def test_degree_distribution_single_scan_plan(spark):
    from omop2owl_vocab_spark.operators.graph import degree_distribution

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    plan = degree_distribution(e)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Sort" not in plan.replace("SortAggregate", "")


def test_k_core_peels_tail_and_keeps_clique(spark):
    from omop2owl_vocab_spark.operators.graph import k_core

    # K4 clique on 1..4 plus a pendant path 4-5-6: 2-core = the clique
    # plus... 5,6 peel (deg 1 after each round); parallel edge + self
    # loop must not inflate degrees.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 5), (3, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["degree"] for r in k_core(e, k=2, rounds=8).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=4: nothing survives (max degree in the simple graph is 4 at
    # node 4 pre-peel, but the clique is only 3-regular after 5 drops)
    assert k_core(e, k=4, rounds=8).count() == 0


def test_k_core_not_converged_rounds_semantics(spark):
    from omop2owl_vocab_spark.operators.graph import k_core

    # path 1-2-3-4-5: 2-core empty, but each round only strips the
    # endpoints -> after ONE round the inner path 2-3-4 remains
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got1 = {r["node"]: r["degree"] for r in k_core(e, 2, rounds=1).collect()}
    assert got1 == {2: 1, 3: 2, 4: 1}
    assert k_core(e, 2, rounds=8).count() == 0


def test_bfs_distances_min_hops_multi_source(spark):
    from omop2owl_vocab_spark.operators.graph import bfs_distances

    # path 1-2-3-4-5-6 plus chord 2-5; sources {1, 6}
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 5)],
        "src long, dst long",
    )
    srcs = spark.createDataFrame([(1,), (6,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, srcs, max_hops=4).collect()
    }
    # 5 is 1 from 6; 3 is 2 from 1; 4 is min(3 via 1-2-5-4? no: 1-2-5=2,
    # then 4 at 3; via 6: 6-5-4 = 2) -> 2
    assert got == {1: 0, 6: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_bfs_distances_cutoff_and_directed(spark):
    from omop2owl_vocab_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, srcs, max_hops=2, directed=True).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}  # 4 is beyond the cutoff
    # directed: nothing reaches 1 backwards
    srcs4 = spark.createDataFrame([(4,)], "node long")
    got4 = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, srcs4, max_hops=3, directed=True).collect()
    }
    assert got4 == {4: 0}


def test_label_propagation_two_cliques_bridge(spark):
    from omop2owl_vocab_spark.operators.graph import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by bridge 3-10.
    # Hand-computed SYNCHRONOUS rounds (min-label tiebreak):
    # r1: 1 sees {2,3} tie->2; 2 sees {1,3}->1; 3 sees {1,2,10}->1;
    #     10 sees {11,12,3} tie->3; 11,12 see {10,..}->10
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    r1 = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=1).collect()
    }
    assert r1 == {1: 2, 2: 1, 3: 1, 10: 3, 11: 10, 12: 10}
    # by r3 the min label has invaded across the bridge — correct
    # synchronous-LPA dynamics (the fixed-round contract, not a
    # converged community split)
    r3 = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=3).collect()
    }
    assert r3 == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_label_propagation_tiebreak_min_label(spark):
    from omop2owl_vocab_spark.operators.graph import label_propagation

    # star center 5 with leaves 2,7: round 1 -> center sees {2,7}
    # equally often, tie -> 2; leaves see only 5 -> 5
    e = spark.createDataFrame([(5, 2), (5, 7)], "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=1).collect()
    }
    assert got == {5: 2, 2: 5, 7: 5}


def test_bellman_ford_weighted_vs_hops(spark):
    from omop2owl_vocab_spark.operators.graph import bellman_ford

    # 1->2 (w10), 2->3 (w10), 1->3 (w25): cheapest to 3 is 20 via 2
    # hops even though the direct edge exists; 3->4 w-5 exercises a
    # negative (acyclic) weight
    e = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 10), (1, 3, 25), (3, 4, -5)],
        "src long, dst long, w long",
    )
    srcs = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bellman_ford(e, srcs, rounds=6).collect()
    }
    assert got == {1: 0, 2: 10, 3: 20, 4: 15}
    # hop-bounded: one round only sees direct edges
    got1 = {
        r["node"]: r["dist"]
        for r in bellman_ford(e, srcs, rounds=1).collect()
    }
    assert got1 == {1: 0, 2: 10, 3: 25}


def test_cooccurrence_pairs_basket_projection(spark):
    from omop2owl_vocab_spark.operators.graph import cooccurrence_pairs

    rows = [
        (1, "x"), (1, "y"), (1, "x"),   # dup item in basket counts once
        (2, "x"), (2, "y"), (2, "z"),
        (3, "y"), (3, "z"),
    ]
    df = spark.createDataFrame(rows, "o long, p string")
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(df, "o", "p", min_count=2).collect()
    }
    assert got == {("x", "y"): 2, ("y", "z"): 2}
    # cap drops the 3-item basket entirely
    got_cap = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(
            df, "o", "p", min_count=1, max_basket_size=2
        ).collect()
    }
    assert got_cap == {("x", "y"): 1, ("y", "z"): 1}
