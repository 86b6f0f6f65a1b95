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
