"""Ordered-sequence funnel analysis over an event stream — the
conversion primitive (signup → click → purchase): for each user, the
earliest strictly-increasing chain of timestamps through the requested
step sequence, plus how many steps were completed.

Semantics: GREEDY-EARLIEST matching — ``ts_1`` = the user's earliest
step-1 event; ``ts_i`` = the earliest step-i event strictly after
``ts_{i-1}``.  Without a conversion window this is COMPLETE: if any
strictly-increasing chain exists, the greedy chain exists too (the
greedy prefix timestamps are ≤ any other chain's, so every suffix that
worked still works) — so ``steps_completed`` is exact, not a heuristic.
A ``t1``-anchored conversion window would break that completeness
(early anchor + late tail), which is why this operator deliberately has
no window parameter — compose with a time filter upstream when a
cohort window is wanted.

Plan shape: k-1 chained (aggregate → hash equi-join on user) stages —
each stage shuffles only (user, ts) pairs for ONE event type, then one
final left-join assembly; everything is built-in aggregates, no window
over the full stream, no UDF.  At 100 TB the per-stage frames are one
row per user (monotonically shrinking down the funnel), so AQE
broadcasts the deep-funnel tails automatically.

Reference analog: none (mandated events/LLM-pipeline surface;
sessionization's batch twin lives in `streaming/sessionize.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user who completed at least step 1:
    ``(user_col, ts_1 .. ts_k, steps_completed)`` with ``ts_i`` the
    greedy-earliest chain timestamp in epoch micros (NULL once the
    funnel is abandoned; timestamps strictly increase along the chain).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col), F.col(type_col).alias("__et"), ts_us.alias("__ts")
    )
    stage_frames = []
    cur = (
        ev.filter(F.col("__et") == steps[0])
        .groupBy(user_col)
        .agg(F.min("__ts").alias("ts_1"))
    )
    stage_frames.append(cur)
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("__et") == step)
        cur = (
            cur.select(user_col, F.col(f"ts_{i - 1}").alias("__prev"))
            .join(nxt, user_col)
            .filter(F.col("__ts") > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"ts_{i}"))
        )
        stage_frames.append(cur)
    out = stage_frames[0]
    for f in stage_frames[1:]:
        out = out.join(f, user_col, "left")
    ts_cols = [f"ts_{i}" for i in range(1, len(steps) + 1)]
    completed = sum(
        (F.col(c).isNotNull().cast("long") for c in ts_cols),
        F.lit(0).cast("long"),
    )
    return out.select(
        user_col, *ts_cols, completed.alias("steps_completed")
    )
