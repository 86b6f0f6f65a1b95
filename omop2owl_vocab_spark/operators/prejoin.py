"""Broadcast bucket-sketch join prefilter — the poor-man's bloom filter
that stays declarative.

``bucket_prefilter_semi_join`` answers the same question as a plain
``left_semi`` join, but in two stages: (1) broadcast the DISTINCT hash
buckets of the small side's keys (bounded by ``n_buckets`` longs no
matter how many or how wide the keys are) and drop big-side rows whose
bucket can't match — a map-side filter with zero shuffle; (2) exact
semi-join the survivors.  False positives from bucket collisions are
removed by stage 2, so the result is EXACTLY the semi join; the win is
that the stage-2 shuffle only carries rows that passed the sketch —
at 100 TB the difference between shuffling the full fact table and
shuffling ~selectivity·|big| rows.

This is the manual, composable form of what Spark's runtime bloom
filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
for suitable shapes; having it as an operator makes the prefilter
available on shapes the optimizer won't rewrite (multi-column keys,
pre-aggregated small sides, checkpointed intermediates).

Reference analog: none (join-strategy surface mandated by the
100 TB posture; the reference's pandas merge has no equivalent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_prefilter_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[tuple[str, str]],
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """``big LEFT SEMI JOIN small`` on ``on`` = [(big_col, small_col),
    ...] pairs, with a broadcast bucket-sketch prefilter.

    The sketch is ``pmod(xxhash64(keys), n_buckets)`` — one long per
    distinct occupied bucket, at most ``n_buckets`` rows broadcast
    regardless of the small side's cardinality or key width.  Pick
    ``n_buckets`` >> |small keys| for low false-positive rates (FP
    rate ~= |small keys| / n_buckets, each FP only costing wasted
    shuffle, never a wrong row).
    """
    if not on:
        raise ValueError("need at least one join column pair")
    big_keys = [F.col(b) for b, _ in on]
    small_keys = [F.col(s) for _, s in on]
    sketch = (
        small.select(
            F.pmod(F.xxhash64(*small_keys), F.lit(n_buckets)).alias("__bkt")
        )
        .distinct()
    )
    prefiltered = (
        big.withColumn("__bkt", F.pmod(F.xxhash64(*big_keys), F.lit(n_buckets)))
        .join(F.broadcast(sketch), "__bkt", "left_semi")
        .drop("__bkt")
    )
    cond = None
    small_a = small.alias("__small")
    big_a = prefiltered.alias("__big")
    for b, s in on:
        c = F.col(f"__big.{b}") == F.col(f"__small.{s}")
        cond = c if cond is None else (cond & c)
    return big_a.join(small_a, cond, "left_semi")
