"""personalized_pagerank: seed-restricted teleport, integer
recurrence, locality."""

from omop2owl_vocab_spark.operators.graph import personalized_pagerank

S = 10**9


def test_hand_unrolled_one_iteration(spark):
    # 1 -> 2 -> 3, seed {1}: r0 = (S, 0, 0)
    # r1(1) = 0.15S; r1(2) = 0.85 * (S div 1) div 100 * ... = 85*S div 100
    # r1(3) = 0 (node 2 had no mass yet)
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank_e9"]
        for r in personalized_pagerank(edges, seeds, iterations=1).collect()
    }
    assert got == {1: 150000000, 2: 850000000, 3: 0}


def test_mass_stays_near_seeds(spark):
    # two disjoint chains; only the seeded chain ever has mass
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank_e9"]
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }
    assert got[10] == 0 and got[11] == 0
    assert got[1] > 0 and got[2] > 0


def test_multi_seed_and_duplicate_seed_rows(spark):
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    s1 = spark.createDataFrame([(1,), (2,)], "node long")
    s2 = spark.createDataFrame([(1,), (2,), (2,)], "node long")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(personalized_pagerank(edges, s1)) == key(
        personalized_pagerank(edges, s2)
    )
