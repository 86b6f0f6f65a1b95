"""Time-series densification — gap-filling sparse per-key event counts
into a contiguous daily series, the preprocessing step every
rate/trend/anomaly computation assumes (a missing day must read as an
explicit zero, not an absent row, or moving averages and diffs lie).

Reference analog: none (mandated analytics surface next to
`operators/funnel.py`'s event readouts).

Engine-exactness: days are epoch-day integers
(``epoch_us div 86_400_000_000``); the spine is an integer
``sequence(lo, hi)`` per key — no calendar arithmetic, no timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key contiguous daily counts: ``(key, day, n)`` for EVERY
    epoch day between the key's first and last event, zeros where the
    key was silent.

    Plan shape: one hash-agg to (key, day) counts — the only
    data-sized shuffle, map-side combined — then a per-key min/max
    agg (tiny), a generated integer spine (``sequence`` + ``explode``
    — rows are produced by the engine, never collected to the driver),
    and one (key, day) equi-join gluing counts onto the spine with
    ``coalesce(n, 0)``.

    100 TB posture: spine size is Σ_k span(k) rows of two longs —
    output-sized, not input-sized; the join keys are identical on both
    sides so AQE plans it locally after the agg.  A key whose span is
    pathological (one event in 1970, one today) inflates only its own
    spine — bound it upstream with a time-range filter if that
    matters.
    """
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    counts = (
        events.select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count("*").cast("long").alias("__n"))
    )
    rng = counts.groupBy("key").agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = rng.select(
        "key",
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day"),
    )
    return (
        spine.join(counts, ["key", "day"], "left")
        .select(
            "key", "day", F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n")
        )
    )


def rolling_daily(
    filled: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window aggregates over a gap-filled daily series
    (`gap_fill_daily` output shape ``(key, day, n)``): per row, the
    ``window_days``-day trailing ``sum_w``, the actual day count
    ``days_w`` (< window_days only during each key's ramp-in), and the
    integer fixed-point mean ``avg_e4 = sum_w·10^4 div days_w`` — the
    moving-average / trend readout the densification exists for (on a
    NON-filled series a RANGE frame would silently average over holes).

    Plan shape: one per-key sort feeding a single RANGE window frame
    (both aggregates share it); sums are integer so there is no float
    reduction-order exposure.  100 TB posture: windows are per-key and
    the series is output-sized (days × keys); a pathological multi-year
    key costs only its own partition's sort.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("key")
        .orderBy(F.col("day").cast("long"))
        .rangeBetween(-(window_days - 1), 0)
    )
    return filled.select(
        "key",
        "day",
        "n",
        F.sum("n").over(w).cast("long").alias("sum_w"),
        F.count("*").over(w).cast("long").alias("days_w"),
    ).select(
        "key", "day", "n", "sum_w", "days_w",
        F.expr("(sum_w * 10000) div days_w").alias("avg_e4"),
    )


def max_concurrency(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line peak concurrency per key: ``(keys..., peak,
    peak_at)`` — the maximum number of [start, end) intervals open at
    once, and the earliest instant the peak is reached.  The capacity
    primitive (peak concurrent sessions per user, max simultaneous
    builds per repo, connection-pool sizing).

    Classic sweep: +1 at each start, -1 at each end, running sum over
    the merged event stream ordered by (instant, delta) — ends sort
    BEFORE starts at the same instant (delta -1 < +1), so touching
    intervals [a,b) [b,c) never double-count.  One shuffle+sort per
    key partition; the running sum and the peak argmax share it.
    Intervals with NULL endpoints are dropped.
    """
    pts = (
        df.filter(
            F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
        )
        .select(
            *keys,
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).alias("at"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.col(end_col).alias("at"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("__ev"),
        )
        .select(*keys, "__ev.at", "__ev.delta")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("at", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = pts.select(
        *keys, "at", F.sum("delta").over(w).alias("open")
    )
    return (
        running.groupBy(*keys)
        .agg(
            F.max("open").cast("long").alias("peak"),
            F.min_by("at", F.struct((-F.col("open")).alias("n"), F.col("at")))
            .alias("peak_at"),
        )
    )


def cumulative_distinct(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    seq_cols: list[str],
    out_col: str = "n_seen",
) -> DataFrame:
    """Running count of DISTINCT items per key over an ordered stream:
    one output row per input row, ``out_col`` = how many distinct
    ``item_col`` values the key has produced up to and including this
    row — the discovery/engagement curve (new vocabulary per user, new
    files touched per repo over time).

    Two windows on the same key partitioning: a per-(key, item)
    row_number marks each item's FIRST occurrence, then a running sum
    of those first-occurrence flags over (keys, seq order).  No
    distinct-aggregate state, no collect_set growth — O(1) per row.
    """
    worder = [F.col(c) for c in seq_cols]
    w_first = Window.partitionBy(*keys, item_col).orderBy(*worder)
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(*worder)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "__new", (F.row_number().over(w_first) == 1).cast("long")
    )
    return flagged.withColumn(
        out_col, F.sum("__new").over(w_run)
    ).drop("__new")
