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


def precision_recall(engine: DataFrame, oracle: DataFrame) -> tuple[float, float]:
    """Distributed P/R over (subj, pred, obj) — the same contract as the
    test oracle's set version, usable at scales where collect() can't."""
    e = engine.select(*_KEY).distinct()
    o = oracle.select(*_KEY).distinct()
    tp = e.join(o, _KEY, "left_semi").count()
    ne, no = e.count(), o.count()
    return (tp / ne if ne else 1.0), (tp / no if no else 1.0)
