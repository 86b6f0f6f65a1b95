"""Change-data-capture operators: changelog → snapshot (upsert) and
SCD-2 history (versioned validity intervals).

The north-rule pipeline materializes partitioned triple tables that are
consumed incrementally (Iceberg-style); these are the two standard ways
a downstream keeps state in sync with a mutating source:

- ``changelog_apply`` — last-writer-wins MERGE: collapse an
  insert/update/delete log to the final per-key row, dropping keys whose
  LAST operation is a delete.
- ``scd2_history`` — slowly-changing-dimension type 2: collapse each
  key's attribute stream into change-point versions with
  ``[valid_from, valid_to)`` validity intervals (open ``valid_to`` for
  the current version).

Scale posture:
- ``changelog_apply`` is a single ``max_by(struct(payload),
  struct(seq))`` hash aggregate — partially aggregatable, so map-side
  combine collapses each key's log BEFORE the shuffle (a window +
  ``row_number`` formulation would shuffle every log row).  One
  exchange on the key, no sort.
- ``scd2_history`` needs the per-key event order, so it pays one
  shuffle+sort on the key; the change-point flag, running version sum,
  and version-interval ``lead`` all reuse that single partitioning
  (Catalyst collapses them into one Window stage pair), and the
  ``lead`` runs over the already-collapsed version frame (rows =
  #versions, not #events).

Reference analog: none (mandated pipeline surface; the reference's
whole-run memoization C1 is the degenerate "recompute everything"
answer to source mutation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def changelog_apply(
    log: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_values: Sequence[str] = ("D", "delete"),
) -> DataFrame:
    """Collapse a CDC changelog to its final snapshot.

    ``seq_cols`` must totally order each key's log (e.g. a commit LSN,
    or ``(ts, event_id)``); the row with the greatest sequence wins.
    If ``op_col`` is given, keys whose winning row's op is in
    ``delete_values`` are dropped (tombstone semantics — a later
    re-insert resurrects the key, matching MERGE behavior).

    Output: one row per surviving key with every non-key column of the
    winning log row (sequence columns included).
    """
    keys = list(keys)
    payload = [c for c in log.columns if c not in keys]
    if not payload:
        raise ValueError("changelog has no payload columns")
    missing = [c for c in seq_cols if c not in log.columns]
    if missing:
        raise ValueError(f"seq_cols not in changelog: {missing}")
    winner = log.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("__win")
    )
    out = winner.select(*keys, "__win.*")
    if op_col is not None:
        out = out.filter(~F.col(op_col).isin(list(delete_values)))
    return out


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    seq_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build SCD-2 validity intervals from a per-key attribute stream.

    A new version starts whenever ANY of ``attr_cols`` differs from the
    previous row of the same key (NULL-safe comparison), ordered by
    ``(seq_col, *tiebreak_cols)``.  Consecutive rows with identical
    attributes collapse into one version.

    Output: ``(*keys, version, *attr_cols, valid_from, valid_to)`` —
    ``version`` is 1-based per key, ``valid_from`` the first ``seq_col``
    value of the version, ``valid_to`` the next version's
    ``valid_from`` (NULL for the key's current version).
    """
    keys = list(keys)
    attr_cols = list(attr_cols)
    order = [F.col(seq_col)] + [F.col(c) for c in tiebreak_cols]
    w_order = Window.partitionBy(*keys).orderBy(*order)
    w = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # lag of a literal is NULL exactly on the key's first row — an
    # explicit marker, since eqNullSafe(NULL, NULL) would otherwise
    # miss a first row whose attributes are all NULL
    changed = F.lag(F.lit(1)).over(w_order).isNull()
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w_order)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    versioned = df.withColumn(
        "version", F.sum(changed.cast("long")).over(w)
    )
    collapsed = versioned.groupBy(*keys, "version").agg(
        F.min(seq_col).alias("valid_from"),
        *[F.min(c).alias(c) for c in attr_cols],  # constant within group
    )
    wv = Window.partitionBy(*keys).orderBy("version")
    return collapsed.select(
        *keys,
        "version",
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )
