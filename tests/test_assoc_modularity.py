"""association_rules (confidence/lift in exact e4) and modularity
(exact integer community decomposition)."""

from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.graph import association_rules, modularity


def test_association_rules_exact_values(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    # n(a)=3, n(b)=3, n(c)=1, N=4; pair (a,b): 2
    # conf(a->b) = 2/3 -> 6666; lift = 2*4/(3*3) -> 8888
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_ante"], r["n_cons"],
            r["n_baskets"], r["conf_e4"], r["lift_e4"],
        )
        for r in association_rules(df, "basket", "item").collect()
    }
    assert got == {
        ("a", "b"): (2, 3, 3, 4, 6666, 8888),
        ("b", "a"): (2, 3, 3, 4, 6666, 8888),
    }


def test_association_rules_min_count_and_cap(spark):
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "x"), (3, "y"), (3, "z"),  # dropped by max_basket_size=2
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(
        df, "basket", "item", min_pair_count=2, max_basket_size=2
    )
    got = {(r["antecedent"], r["consequent"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "a")}
    # the capped basket is gone from the basket universe too
    assert out.collect()[0]["n_baskets"] == 2


def test_modularity_two_cliques_bridge(spark):
    # two triangles {1,2,3} and {4,5,6} joined by bridge 3-4; m=7
    # labels = clique id: in_c=3 each, tot_deg: {1:2,2:2,3:3} -> 7
    # contrib = 4*7*3 - 49 = 35 per community; Q = 70/196 ~ 0.357
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(n, n <= 3 and "L" or "R") for n in range(1, 7)],
        "node long, label string",
    )
    got = {
        r["label"]: (
            r["n_nodes"], r["in_edges"], r["tot_deg"], r["m"],
            r["contrib_num"],
        )
        for r in modularity(edges, labels).collect()
    }
    assert got == {
        "L": (3, 3, 7, 7, 35),
        "R": (3, 3, 7, 7, 35),
    }


def test_modularity_null_partition_is_negative(spark):
    # everything in one community: Q = 4m*m - (2m)^2 = 0; split a
    # single edge across two communities: each side contrib = -1
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    one = spark.createDataFrame([(1, "x"), (2, "x")], "node long, label string")
    assert modularity(edges, one).collect()[0]["contrib_num"] == 0
    two = spark.createDataFrame([(1, "x"), (2, "y")], "node long, label string")
    vals = sorted(
        r["contrib_num"] for r in modularity(edges, two).collect()
    )
    assert vals == [-1, -1]


def test_modularity_label_without_edges(spark):
    # an isolated labeled node appears with zero degree and edges
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, "x"), (2, "x"), (9, "z")], "node long, label string"
    )
    got = {r["label"]: tuple(r)[1:] for r in modularity(edges, labels).collect()}
    assert got["z"] == (1, 0, 0, 1, 0)
