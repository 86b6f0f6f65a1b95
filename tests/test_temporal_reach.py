"""temporal_reachability: time-respecting earliest arrival — edges
usable only at or after the walker's arrival."""

from omop2owl_vocab_spark.operators.graph import temporal_reachability


def _run(spark, edges, sources, rounds=3):
    e = spark.createDataFrame(edges, "src long, dst long, t long")
    s = spark.createDataFrame(sources, "node long, t0 long")
    return {
        r["node"]: r["arrival"]
        for r in temporal_reachability(e, s, rounds=rounds).collect()
    }


def test_time_order_blocks_static_path(spark):
    # 1 -(t=5)-> 2 -(t=3)-> 3: statically 3 is reachable, but the
    # second edge fires BEFORE arrival at 2, so 3 stays unreached
    got = _run(spark, [(1, 2, 5), (2, 3, 3)], [(1, 0)])
    assert got == {1: 0, 2: 5}


def test_earliest_arrival_prefers_slow_start(spark):
    # two routes to 3: direct at t=9, or via 2 (t=1 then t=4)
    got = _run(spark, [(1, 3, 9), (1, 2, 1), (2, 3, 4)], [(1, 0)])
    assert got == {1: 0, 2: 1, 3: 4}


def test_hop_budget_limits(spark):
    # chain of ascending times: rounds=1 reaches one hop only
    edges = [(1, 2, 1), (2, 3, 2), (3, 4, 3)]
    assert _run(spark, edges, [(1, 0)], rounds=1) == {1: 0, 2: 1}
    assert _run(spark, edges, [(1, 0)], rounds=3) == {1: 0, 2: 1, 3: 2, 4: 3}


def test_multi_source_min_and_source_dedup(spark):
    # node 3 reachable from both sources; min arrival wins; duplicate
    # source rows collapse to their min t0
    got = _run(
        spark,
        [(1, 3, 10), (2, 3, 6)],
        [(1, 0), (2, 5), (2, 7)],
    )
    assert got == {1: 0, 2: 5, 3: 6}
