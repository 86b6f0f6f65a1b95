"""global_prefix_sum / budget_select: distributed scan correctness,
partition-count invariance, and the budget cut."""

from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.scan import budget_select, global_prefix_sum


def _expected(rows):
    cum, out = 0, {}
    for k, v in sorted(rows):
        cum += v
        out[k] = cum
    return out


def test_prefix_sum_matches_serial(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(df, [F.col("k").asc()], "v").collect()
    }
    assert got == _expected(rows)


def test_prefix_sum_partition_invariance(spark):
    rows = [(i, i % 5 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v long")
    outs = [
        sorted(
            map(
                tuple,
                global_prefix_sum(
                    df, [F.col("k").asc()], "v", num_partitions=n
                ).collect(),
            )
        )
        for n in (1, 3, 17)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_prefix_sum_descending_order(spark):
    rows = [(1, 10), (2, 20), (3, 30)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in global_prefix_sum(df, [F.col("k").desc()], "v").collect()
    }
    assert got == {3: 30, 2: 50, 1: 60}


def test_budget_select_inclusive_cut(spark):
    # quality-ordered costs 5,5,5,5: budget 12 keeps exactly two rows
    rows = [(1, 5), (2, 5), (3, 5), (4, 5)]
    df = spark.createDataFrame(rows, "k long, c long")
    kept = budget_select(df, [F.col("k").asc()], "c", budget=12)
    assert sorted((r["k"], r["cum"]) for r in kept.collect()) == [
        (1, 5),
        (2, 10),
    ]
    # budget 0 keeps nothing; budget covers all keeps all
    assert budget_select(df, [F.col("k").asc()], "c", 0).count() == 0
    assert budget_select(df, [F.col("k").asc()], "c", 100).count() == 4
