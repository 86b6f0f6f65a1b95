"""hits_fixed: integer HITS semantics — hub/authority split, L-inf
normalization, symmetry, and the fixed-round recurrence."""

from omop2owl_vocab_spark.operators.graph import hits_fixed

S = 10**9


def test_pure_hub_and_authority(spark):
    # star: 0 points at 1,2,3 — 0 is the only hub, leaves are equal
    # authorities; hubs have no authority and vice versa
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub_e9"], r["auth_e9"])
        for r in hits_fixed(edges).collect()
    }
    assert got == {
        0: (S, 0),
        1: (0, S),
        2: (0, S),
        3: (0, S),
    }


def test_recurrence_matches_hand_unroll(spark):
    # 1->3, 2->3, 2->4: one iteration by hand with integer div:
    # a(3)=2S, a(4)=S -> norm a=(S, S/2); h(1)=S, h(2)=S+S/2 -> norm
    # h(1)=(S*S) div (3S/2)=666666666, h(2)=S; second/third rounds
    # keep the same fixed point (a(3)=h1+h2 etc. renormalizes same)
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub_e9"], r["auth_e9"])
        for r in hits_fixed(edges, iterations=1).collect()
    }
    assert got[3] == (0, S)
    assert got[4] == (0, 500000000)
    assert got[2] == (S, 0)
    assert got[1] == (666666666, 0)


def test_duplicate_and_self_edges_collapse(spark):
    base = [(1, 3), (2, 3), (2, 4)]
    noisy = base + base + [(3, 3)]
    e1 = spark.createDataFrame(base, "src long, dst long")
    e2 = spark.createDataFrame(noisy, "src long, dst long")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(hits_fixed(e1)) == key(hits_fixed(e2))
