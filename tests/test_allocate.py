"""allocate_budget: Hamilton largest-remainder apportionment — exact
budget conservation and deterministic tie handling."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omop2owl_vocab_spark.operators.sample import allocate_budget


def _run(spark, rows, budget):
    df = spark.createDataFrame(rows, "g string, n long")
    return {
        r["g"]: r["alloc"]
        for r in allocate_budget(df, ["g"], "n", budget).collect()
    }


def test_classic_hamilton(spark):
    # shares of 100: 4.55, 33.64, 61.82 -> bases 4, 33, 61 (sum 98),
    # two leftovers go to the largest remainders (.82 then .64)
    got = _run(spark, [("a", 5), ("b", 37), ("c", 68)], 100)
    assert got == {"a": 4, "b": 34, "c": 62}
    assert sum(got.values()) == 100


def test_ties_break_by_group_key(spark):
    # equal groups, odd budget: equal remainders — earliest key wins
    got = _run(spark, [("x", 10), ("y", 10)], 5)
    assert got == {"x": 3, "y": 2}


def test_zero_group_and_zero_budget(spark):
    got = _run(spark, [("a", 0), ("b", 10)], 7)
    assert got == {"a": 0, "b": 7}
    got0 = _run(spark, [("a", 3), ("b", 4)], 0)
    assert got0 == {"a": 0, "b": 0}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    budget=st.integers(0, 200),
)
def test_budget_conserved_and_proportional(spark, sizes, budget):
    if sum(sizes) == 0:
        return  # no mass to apportion
    rows = [(f"g{i:02d}", n) for i, n in enumerate(sizes)]
    got = _run(spark, rows, budget)
    assert sum(got.values()) == budget
    total = sum(sizes)
    for (g, n) in rows:
        base = budget * n // total
        assert base <= got[g] <= base + 1
