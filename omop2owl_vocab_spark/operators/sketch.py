"""K-Minimum-Values (KMV / bottom-k) distinct-count sketch — the
cardinality primitive a 100 TB pipeline actually needs: per-group
vocabulary sizes, per-partition key cardinalities for join planning,
dedup-rate estimates — at O(k) state per group instead of O(distinct).

Why not ``approx_count_distinct``: Spark's HLL++ is engine-internal —
its binary registers can't be replayed by an external SQL engine, so
correctness can only be asserted "within rsd", and its sketches aren't
inspectable.  KMV with an md5 hash family is the portable alternative:
the k smallest 60-bit hash values of the distinct set are themselves the
sketch, any IEEE-754 engine derives the identical estimate, two sketches
merge by "union then keep k smallest" (a pure ``array_sort ∘ slice``),
and the estimator's error is the classical (Beyer et al., SIGMOD'07)
``1/sqrt(k-2)`` relative bound.

Hash family: ``conv(substr(md5(value), 1, 15), 16, 10)`` — a uniform
60-bit integer (16^15 ≈ 1.15e18 < 2^63, no sign issues).  Fixed-width
lowercase hex folds to the same long in DuckDB via
``list_reduce(list_transform(...strpos...))``, which is what the driver
oracle does — estimates match hash-exact, not "approximately".

Reference analog: none (timsbiomed/omop2owl-vocab has no approximate
operators); mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = float(16**15)


def kmv_hash(value) -> "F.Column":
    """Uniform 60-bit hash of a string column, portable across engines
    (md5 prefix folded to a long)."""
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the k smallest hashes.

    Output: ``(group_cols..., n_kept, kth_hash, distinct_e4)`` —
    ``n_kept`` = min(k, true distinct), ``kth_hash`` = the k-th smallest
    60-bit hash (NULL when the group has fewer than k distinct values),
    ``distinct_e4`` = the estimate in 4-decimal fixed point.  Groups
    below k distinct values take the EXACT path (`n_kept` is the true
    cardinality, estimate == n_kept) — the estimator only engages where
    approximation is needed, so small groups are never wrong.

    Estimate: ``(k-1) / U_(k)`` with ``U_(k) = kth_hash / 16^15`` — the
    classical bottom-k estimator.  The arithmetic is one plan-time
    double constant ``(k-1)·16^15`` divided by the hash (both engines
    round the long→double cast and the division identically under
    IEEE-754), so the DuckDB oracle reproduces ``distinct_e4`` exactly.

    Plan shape (all linear, no collect): project the hash →
    dedup ``(group, hash)`` (hash-aggregate, map-side combine; md5
    collisions at 60 bits are the standard negligible-collision
    assumption of every KMV deployment) → per-group
    ``row_number <= k`` — Spark 3.5+ plants a WindowGroupLimit
    PARTIAL limit before the shuffle, so each map task forwards at most
    k rows per group: the exchange carries O(groups·k), not
    O(distinct) — that is the whole scale story → one final
    per-group aggregate.  Sketch MERGE across shards/streams is
    union-then-keep-k-smallest; `kth_hash` is exposed precisely so
    downstream systems can do that without re-reading data.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (estimator needs k-1 >= 2)")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    # NULL values are excluded BEFORE hashing (r5 advice): md5(NULL) is a
    # NULL hash that survives dropDuplicates, sorts FIRST in Spark's
    # row_number window (stealing a sketch slot and shifting kth_hash)
    # but LAST in DuckDB — the same silent cross-engine divergence the
    # kmv_intersect NULL fix documents; distinct-count semantics ignore
    # NULL anyway.
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(c) for c in group_cols],
        kmv_hash(F.col(value_col)).alias("__h"),
    ).dropDuplicates(group_cols + ["__h"])
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    kept = hashed.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max(F.when(F.col("__r") == k, F.col("__h"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("kth_hash").isNotNull(),
        F.floor(
            F.lit(float(k - 1) * _HEX_SPACE)
            / F.col("kth_hash").cast("double")
            * 10000
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.col("n_kept") * 10000)
    return agg.select(
        *group_cols, "n_kept", "kth_hash", est.alias("distinct_e4")
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog register table over the same portable
    60-bit md5 hash family as `kmv_distinct`: ``(group_cols...,
    bucket, max_rho)`` with ``bucket`` the low ``b`` hash bits and
    ``max_rho`` the maximum leading-zero rank (Flajolet's ρ) of the
    remaining ``60-b`` bits — only NON-EMPTY buckets appear, so state
    is ≤ 2^b rows per group no matter the cardinality.

    Unlike Spark's built-in ``approx_count_distinct`` (HLL++ with
    engine-private binary registers), every column here is a plain
    long any SQL engine reproduces bit-for-bit: ρ is derived from the
    BINARY-STRING LENGTH of the sub-hash (``conv(w, 10, 2)`` /
    DuckDB ``bin(w)``) — pure integer + string ops, no float log2
    whose libm rounding could differ across engines.  Two register
    tables merge by ``max(max_rho)`` per ``(group, bucket)`` — the
    shard-parallel / streaming merge story, same as KMV's
    union-keep-k.

    Plan shape: one projection (hash, bucket, ρ) → one hash-agg with
    map-side partial max — a single key-partitioned shuffle carrying
    at most ``groups · 2^b`` rows out of the map side.
    """
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    m = 1 << b
    wbits = 60 - b
    # NULL exclusion mirrors kmv_distinct (r5 advice): a NULL value hashes
    # to NULL, lands in a NULL bucket, and the NULL-falsy ``__w > 0`` test
    # would assign the MAXIMAL rho — a phantom register that inflates the
    # estimate and, once merged into a streaming register table, persists.
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(c) for c in group_cols],
        kmv_hash(F.col(value_col)).alias("__h"),
    )
    proj = hashed.select(
        *group_cols,
        (F.col("__h") % m).cast("long").alias("bucket"),
        F.expr(f"__h div {m}").alias("__w"),
    ).select(
        *group_cols,
        "bucket",
        F.when(
            F.col("__w") > 0,
            F.lit(wbits + 1)
            - F.length(F.conv(F.col("__w").cast("string"), 10, 2)),
        )
        .otherwise(F.lit(wbits + 1))
        .cast("long")
        .alias("__rho"),
    )
    return proj.groupBy(*group_cols, "bucket").agg(
        F.max("__rho").cast("long").alias("max_rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Fold a `hll_registers` table to one row per group:
    ``(group_cols..., n_buckets, sum_pow, est_e4)``.

    ``sum_pow`` is the EXACT integer harmonic denominator scaled by
    2^(61-b): Σ over all 2^b registers of 2^(61-b-ρ), empty registers
    contributing ρ=0 terms.  The scale is one bit ABOVE the sub-hash
    width on purpose: ρ ranges up to (60-b)+1 (a zero sub-hash), and at
    scale 2^(60-b) that maximal register's term would be 2^-1 — a
    NEGATIVE shift count, which Java masks mod 64 into 1<<63 (garbage)
    while DuckDB does something else entirely.  At 2^(61-b) every
    exponent is ≥ 0, each term and the 2^b-term sum still fit a long
    (≤ 2^(61-b) · 2^b = 2^61), and the arithmetic stays exact.
    ``est_e4`` is the raw HLL estimate α_m·m²/Σ2^(−ρ) in 4-decimal
    fixed point, computed as ONE IEEE-754 double division of a
    plan-time constant by ``sum_pow`` — the same portability argument
    as `kmv_distinct`'s estimator, so the DuckDB oracle reproduces it
    hash-exact.  (Raw estimator only: the small-range linear-counting
    correction needs ln(), whose libm rounding is NOT engine-portable —
    callers with tiny groups should use `kmv_distinct`'s exact path
    instead.)
    """
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    wbits = 60 - b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = alpha * m * m * float(1 << (wbits + 1))
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(1L, {wbits + 1} - max_rho)")
        )
        .cast("long")
        .alias("__present_pow"),
    )
    sum_pow = F.col("__present_pow") + (
        (F.lit(m) - F.col("n_buckets")) * F.lit(1 << (wbits + 1))
    )
    return agg.select(
        *group_cols,
        "n_buckets",
        sum_pow.cast("long").alias("sum_pow"),
        F.floor(
            F.lit(numer) / sum_pow.cast("double") * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("est_e4"),
    )


def kmv_intersect(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style SET-INTERSECTION estimate from two KMV
    sketches — the sketch-algebra step `kmv_distinct` (one set) and
    `hll_registers` (union by merge) can't do: one row
    ``(n_a, n_b, theta, n_common, inter_est)`` where ``theta`` is the
    smaller of the two k-th-smallest 60-bit hashes (the shared sampling
    threshold; 16^15 when a side holds fewer than k distinct values and
    is therefore EXACT), ``n_common`` counts hash values below theta
    present in BOTH sketches, and

        inter_est = floor(n_common · 16^15 / theta + 0.5)

    — the standard theta estimator (each distinct element of A∩B lands
    below theta with probability theta/16^15), one IEEE double division
    like `kmv_distinct`'s, so the DuckDB oracle reproduces it
    hash-exact.  Audience: overlap QA between corpus snapshots or
    dedup shards without materializing either side's distinct set.

    Plan: per side, one distinct hash-agg and an
    ``orderBy(h).limit(k)`` that Spark executes as
    TakeOrderedAndProject (per-partition heaps, O(k) driver merge —
    never a global sort), then two k-row broadcast-sized folds and one
    k⋈k hash join.  Everything after the two input scans touches at
    most 2k rows.
    """
    if k < 3:
        raise ValueError("k must be >= 3")

    def _sketch(df: DataFrame):
        # NULLs never enter the sketch: a NULL hash would sort FIRST in
        # Spark (stealing a slot and flipping the exact path's theta)
        # but LAST in DuckDB — a silent cross-engine divergence
        hashes = (
            df.filter(F.col(value_col).isNotNull())
            .select(kmv_hash(F.col(value_col)).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )
        stats = hashes.agg(
            F.count("*").cast("long").alias("n"),
            F.max("h").alias("mx"),
        )
        return hashes, stats

    ha, sa = _sketch(a)
    hb, sb = _sketch(b)
    full = float(_HEX_SPACE)
    theta_a = F.when(F.col("na") == k, F.col("mxa")).otherwise(
        F.lit(int(_HEX_SPACE))
    )
    theta_b = F.when(F.col("nb") == k, F.col("mxb")).otherwise(
        F.lit(int(_HEX_SPACE))
    )
    stats = (
        sa.select(F.col("n").alias("na"), F.col("mx").alias("mxa"))
        .crossJoin(
            sb.select(F.col("n").alias("nb"), F.col("mx").alias("mxb"))
        )
        .select(
            "na",
            "nb",
            F.least(theta_a, theta_b).cast("long").alias("theta"),
        )
    )
    common = (
        ha.join(hb, "h")
        .crossJoin(F.broadcast(stats.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        stats.crossJoin(F.broadcast(common))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "theta",
            "n_common",
            F.floor(
                F.col("n_common").cast("double")
                * F.lit(full)
                / F.col("theta").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("inter_est"),
        )
    )
