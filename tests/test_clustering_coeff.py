"""clustering_coefficient: per-node triangle counts and local
clustering in exact e4 fixed point."""

from omop2owl_vocab_spark.operators.graph import clustering_coefficient


def test_k4_minus_edge(spark):
    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    # deg: 1->3, 2->3, 3->2, 4->2; tri: 1->2, 2->2, 3->1, 4->1
    # lcc: 1,2 -> 2*2*10000 div (3*2) = 6666; 3,4 -> 2*1*10000 div 2 = 10000
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["lcc_e4"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {
        1: (3, 2, 6666),
        2: (3, 2, 6666),
        3: (2, 1, 10000),
        4: (2, 1, 10000),
    }


def test_triangle_free_and_isolated_direction(spark):
    # a path graph has no triangles; duplicate/reversed edges collapse;
    # self-loops drop entirely
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 3)], "src long, dst long"
    )
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["lcc_e4"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {1: (1, 0, 0), 2: (2, 0, 0), 3: (1, 0, 0)}


def test_matches_global_triangle_count(spark):
    # sum of per-node triangles == 3 x global count on a mixed graph
    from omop2owl_vocab_spark.operators.graph import triangle_count

    rows = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, (i + 1) % 40) for i in range(40)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    per_node = clustering_coefficient(edges)
    total = per_node.groupBy().sum("n_tri").collect()[0][0]
    n_global = triangle_count(edges).collect()[0]["n_triangles"]
    assert total == 3 * n_global
