"""U2 — triple-set diff (snapshot comparison / regression tooling).

The reference has no intersect/except usage; our P/R oracle and ops teams
comparing two materialized triple tables need exactly this: what was
added, what was removed.  ``exceptAll`` keeps duplicate-aware semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEY = ["subj", "pred", "obj"]


def triples_diff(new: DataFrame, old: DataFrame) -> dict[str, DataFrame]:
    n = new.select(*_KEY)
    o = old.select(*_KEY)
    return {"added": n.exceptAll(o), "removed": o.exceptAll(n)}


def keyed_diff(
    new: DataFrame,
    old: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff keyed by primary key — the Iceberg-snapshot /
    SCD-change-capture primitive: one row per key present in either
    version, with ``status`` ∈ {added, removed, changed, unchanged} and
    ``changed_cols`` = the sorted comma-joined names of the compared
    columns whose values differ (empty string otherwise).

    Output carries the key columns plus ``status`` / ``changed_cols``
    only — payload projection is the caller's join-back (keeps the diff
    narrow: at 100 TB the change-set is usually ≪ the snapshot, so join
    back only the changed keys).

    Plan shape: ONE full-outer hash equi-join on the key, then a narrow
    projection — per-column comparison is a null-safe equality
    (``eqNullSafe``: NULL→NULL is unchanged, NULL→value is changed)
    folded into a ``concat_ws`` over ``when`` columns; no UDF, no
    second shuffle.  Compared columns default to all shared non-key
    columns.  Reference analog: none (U2 family; snapshot tooling the
    north star's Iceberg posture implies).
    """
    from pyspark.sql import functions as F

    if not keys:
        raise ValueError("keys must be non-empty")
    if compare is None:
        shared = [c for c in new.columns if c in set(old.columns)]
        compare = sorted(c for c in shared if c not in set(keys))
    # presence flags are sentinel lits so NULL payloads can't fake absence;
    # full-outer on the key LIST coalesces the key columns automatically
    n = new.select(*keys, *compare).alias("n").withColumn("__np", F.lit(1))
    o = old.select(*keys, *compare).alias("o").withColumn("__op", F.lit(1))
    j = n.join(o, keys, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}")), F.lit(c)
        )
        for c in compare
    ]
    changed_cols = F.concat_ws(",", *diffs) if diffs else F.lit("")
    status = (
        F.when(F.col("__op").isNull(), F.lit("added"))
        .when(F.col("__np").isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        F.when(status == "changed", changed_cols)
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def precision_recall(engine: DataFrame, oracle: DataFrame) -> tuple[float, float]:
    """Distributed P/R over (subj, pred, obj) — the same contract as the
    test oracle's set version, usable at scales where collect() can't."""
    e = engine.select(*_KEY).distinct()
    o = oracle.select(*_KEY).distinct()
    tp = e.join(o, _KEY, "left_semi").count()
    ne, no = e.count(), o.count()
    return (tp / ne if ne else 1.0), (tp / no if no else 1.0)
