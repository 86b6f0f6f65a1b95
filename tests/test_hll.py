"""hll_registers / hll_estimate: portable-HLL register semantics,
merge law, and estimator accuracy."""

import hashlib

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.sketch import hll_estimate, hll_registers


def _expected_register(value: str, b: int = 8):
    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    m = 1 << b
    w = h // m
    wbits = 60 - b
    rho = (wbits + 1) - w.bit_length() if w > 0 else wbits + 1
    return h % m, rho


def test_registers_match_reference_hash(spark):
    vals = ["alpha", "beta", "gamma", "delta"]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v string"
    )
    got = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(df, ["grp"], "v").collect()
    }
    want = {}
    for v in vals:
        bkt, rho = _expected_register(v)
        want[bkt] = max(want.get(bkt, 0), rho)
    assert got == want


def test_registers_ignore_duplicates_and_merge(spark):
    # registers(A ∪ B) == merge(registers(A), registers(B)) by max;
    # duplicated values change nothing
    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(200)], "grp string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(100, 300)], "grp string, v string"
    )
    ra, rb = hll_registers(a, ["grp"], "v"), hll_registers(b, ["grp"], "v")
    merged = (
        ra.unionByName(rb)
        .groupBy("grp", "bucket")
        .agg(F.max("max_rho").cast("long").alias("max_rho"))
    )
    whole = hll_registers(a.unionByName(b), ["grp"], "v")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(merged) == key(whole)


def test_estimate_within_rsd(spark):
    # raw HLL at b=8 has rsd ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    n = 20000
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(n)], "grp string, v string"
    )
    est = hll_estimate(hll_registers(df, ["grp"], "v"), ["grp"]).collect()[0]
    assert est["n_buckets"] <= 256
    assert abs(est["est_e4"] / 10000 - n) / n < 0.20


def test_b_bounds():
    with pytest.raises(ValueError):
        hll_estimate(None, ["g"], b=3)
    with pytest.raises(ValueError):
        hll_estimate(None, ["g"], b=17)


def test_estimate_survives_zero_subhash_register(spark):
    # a zero sub-hash produces max_rho = (60-b)+1 = 53 at b=8; the
    # 2^(wbits+1) scaling must keep the shift count >= 0 (a negative
    # count would hit Java's mod-64 masking and corrupt sum_pow)
    regs = spark.createDataFrame(
        [("g", 0, 53), ("g", 1, 1)],
        "grp string, bucket long, max_rho long",
    )
    r = hll_estimate(regs, ["grp"]).collect()[0]
    assert r["sum_pow"] > 0
    # bucket 0 contributes 2^0 = 1, bucket 1 contributes 2^52, the
    # 254 empty buckets 2^53 each
    assert r["sum_pow"] == 1 + (1 << 52) + 254 * (1 << 53)
    assert r["est_e4"] > 0
