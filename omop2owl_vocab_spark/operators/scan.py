"""Distributed global-order scans — running totals over a TOTAL
ordering of the whole table without the classic Spark trap: a
``Window.orderBy(...)`` with no ``partitionBy`` moves every row into
ONE task, which is a non-starter past a few million rows.

``global_prefix_sum`` is the two-pass distributed scan instead
(the textbook parallel-prefix layout on top of range partitioning):

  1. ``repartitionByRange`` on the order key — Spark's RangePartitioner
     assigns ascending key ranges to ascending partition ids, so
     partition boundaries respect the global order;
  2. a per-PARTITION running sum (``Window.partitionBy(pid)`` — fully
     parallel, each task scans only its slice);
  3. per-partition totals (one tiny hash-agg, ≤ #partitions rows)
     folded into per-partition OFFSETS by a prefix sum over the
     partition ids — a window over ≤ a few hundred rows, where the
     single-task shape is exactly right;
  4. one broadcast join adding each row's partition offset.

Wall-clock is two scans + an O(#partitions) fold, independent of skew
in the VALUE column; the only global structure is the ≤ #partitions-row
offset table.  The ordering must be UNIQUE per row (ties make a
row-level prefix sum ill-defined and can split across range-partition
boundaries) — same contract as `timeseries.rolling_median`.

Reference analog: none (mandated large-pipeline surface: token-budget
data selection, global quota cuts, deterministic curriculum cutoffs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Every input row extended with ``out_col`` = the running total of
    ``value_col`` over the global ``order_by`` ordering (inclusive of
    the current row).  Exact long arithmetic; the result is identical
    for ANY partition count — boundaries move work, not values."""
    order_by = list(order_by)
    if not order_by:
        raise ValueError("order_by must be non-empty")
    parted = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    staged = parted.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn(
        "__local", F.sum(value_col).over(w_local)
    )
    # totals hang off the PRE-window frame: the offsets branch then
    # shares only the range exchange with the data path, not the
    # per-partition sort/window subtree (which would otherwise be
    # evaluated twice per action)
    totals = staged.groupBy("__pid").agg(
        F.sum(value_col).cast("long").alias("__total")
    )
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ #partitions rows — the one place a global window is right
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__total").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col, (F.col("__local") + F.col("__off")).cast("long")
        )
        .drop("__pid", "__local", "__off")
    )


def budget_select(
    df: DataFrame,
    order_by: list[Column],
    cost_col: str,
    budget: int,
    cum_col: str = "cum",
) -> DataFrame:
    """Greedy selection under a global budget: walk the table in
    ``order_by`` order (best-first — quality rank, priority, price)
    accumulating ``cost_col``, keep every row whose INCLUSIVE running
    total still fits ``budget``.  The token-budget data-selection
    primitive ("take the highest-quality documents up to 10B training
    tokens"), returning the kept rows plus their running total.

    One `global_prefix_sum` + a pushed filter — the cut is a plain
    predicate on the cum column, so partitions past the budget point
    drop their rows map-side without any further shuffle.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    summed = global_prefix_sum(df, order_by, cost_col, out_col=cum_col)
    return summed.filter(F.col(cum_col) <= budget)


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pareto frontier under MINIMIZATION of both columns: the rows no
    other row dominates (``q`` dominates ``p`` when ``q.x <= p.x`` and
    ``q.y <= p.y`` with at least one strict).  The multi-objective
    data-selection primitive — shortest-AND-highest-quality documents,
    cheapest-AND-fastest plans — returning ``(x, y, n_dups)`` per
    frontier point (exact duplicates don't dominate each other and
    survive together, carried as a count).  Maximize a dimension by
    negating it upstream.

    The classic O(n log n) 2-D sweep, distributed: dominance collapses
    to "y strictly below every y at strictly smaller x", so after one
    hash-agg to ``min(y)``+count per distinct x (same-x rows are
    dominated by their x-group minimum), the frontier test is a STRICT
    prefix-min over the x order — computed with `global_prefix_sum`'s
    two-pass layout (range partition by x → per-partition prefix min →
    ≤#partitions-row fold of partition minima → broadcast combine),
    never a single-task global window and never the naive
    self-anti-join whose range condition is O(n²).  NULL in either
    column drops the row (NULL is not comparable under dominance).
    """
    xy = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    # per distinct x keep only its minimal y (struct min is
    # lexicographic; (x, y) is unique here so c never decides)
    pts = (
        xy.groupBy("x")
        .agg(F.min(F.struct("y", "c")).alias("s"))
        .select("x", F.col("s.y").alias("y"), F.col("s.c").alias("n_dups"))
    )
    parted = pts.repartitionByRange("x").withColumn(
        "__pid", F.spark_partition_id()
    )
    w_prev = (
        Window.partitionBy("__pid")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn("__prev_min", F.min("y").over(w_prev))
    part_min = parted.groupBy("__pid").agg(F.min("y").alias("__pmin"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ #partitions rows — the one safe global window
    offsets = part_min.select(
        "__pid", F.min("__pmin").over(w_off).alias("__off_min")
    )
    before = F.when(
        F.col("__prev_min").isNull(), F.col("__off_min")
    ).when(
        F.col("__off_min").isNull(), F.col("__prev_min")
    ).otherwise(F.least("__prev_min", "__off_min"))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__before", before)
        .filter(F.col("__before").isNull() | (F.col("y") < F.col("__before")))
        .select("x", "y", "n_dups")
    )
