"""skyline_2d: Pareto frontier under minimization — python brute-force
reference and distributed-layout invariance."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omop2owl_vocab_spark.operators.scan import skyline_2d


def _brute(points):
    out = {}
    for p in points:
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in points
        )
        if not dominated:
            out[p] = out.get(p, 0) + 1
    return out


def test_skyline_basic(spark):
    rows = [(1, 9), (2, 7), (3, 8), (4, 4), (9, 1), (9, 9), (4, 4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["n_dups"] for r in skyline_2d(df, "x", "y").collect()}
    assert got == {(1, 9): 1, (2, 7): 1, (4, 4): 2, (9, 1): 1}


def test_skyline_null_and_single(spark):
    rows = [(1, None), (None, 1), (5, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()]
    assert got == [(5, 5)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
    )
)
def test_skyline_matches_brute_force(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["n_dups"]
        for r in skyline_2d(df, "x", "y").collect()
    }
    assert got == _brute(pts)
