"""kmv_intersect: theta-sketch set-intersection estimate semantics."""

import hashlib

from omop2owl_vocab_spark.operators.sketch import kmv_intersect

FULL = 16**15


def _h(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_small_sides_are_exact(spark):
    # both sides below k distinct -> theta = full space -> n_common is
    # the TRUE intersection size and inter_est equals it
    a = spark.createDataFrame(
        [(f"x{i}",) for i in range(10)] * 2, "v string"
    )
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(5, 20)], "v string"
    )
    r = kmv_intersect(a, b, "v", k=64).collect()[0]
    assert (r["n_a"], r["n_b"]) == (10, 15)
    assert r["theta"] == FULL
    assert r["n_common"] == 5
    assert r["inter_est"] == 5


def test_theta_is_min_of_kth_hashes(spark):
    vals_a = [f"a{i}" for i in range(100)]
    vals_b = [f"b{i}" for i in range(100)]
    shared = [f"s{i}" for i in range(50)]
    a = spark.createDataFrame([(v,) for v in vals_a + shared], "v string")
    b = spark.createDataFrame([(v,) for v in vals_b + shared], "v string")
    k = 32
    r = kmv_intersect(a, b, "v", k=k).collect()[0]
    kth_a = sorted(_h(v) for v in vals_a + shared)[k - 1]
    kth_b = sorted(_h(v) for v in vals_b + shared)[k - 1]
    assert r["theta"] == min(kth_a, kth_b)
    # n_common computed from the python model of both sketches
    sa = set(sorted(_h(v) for v in vals_a + shared)[:k])
    sb = set(sorted(_h(v) for v in vals_b + shared)[:k])
    want = len({h for h in sa & sb if h < r["theta"]})
    assert r["n_common"] == want


def test_estimate_accuracy_on_large_overlap(spark):
    # 2000-element sets sharing 1000: estimate within ~40% at k=256
    a = spark.createDataFrame(
        [(f"a{i}",) for i in range(1000)]
        + [(f"s{i}",) for i in range(1000)],
        "v string",
    )
    b = spark.createDataFrame(
        [(f"b{i}",) for i in range(1000)]
        + [(f"s{i}",) for i in range(1000)],
        "v string",
    )
    r = kmv_intersect(a, b, "v", k=256).collect()[0]
    assert 600 <= r["inter_est"] <= 1400
