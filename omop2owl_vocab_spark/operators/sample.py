"""Deterministic corpus sampling — the audit/eval-set primitive every
training pipeline needs: pull k documents per stratum (language, source,
quality band) reproducibly, independent of partitioning, cluster size,
or row order.

Engine-portable derivation (md5 rank, same family as the split/pack
bookkeeping in ``operators/pack.py``) so the DuckDB oracle replays it
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """The k lowest-md5-rank documents of every stratum.

    Rank key = md5(f"{seed}:{id}") — a uniform, reproducible shuffle of
    each stratum; changing ``seed`` re-deals.  Exact top-k per stratum
    via ``row_number`` over (key, id): one partitioned window — strata
    sort independently, so the plan is n_strata parallel linear sorts,
    not a global one.

    At 100 TB scale, pre-prune before the window: keep rows whose key is
    below ≈ (k / stratum_rows) · 2 of the hex keyspace (stratum counts
    from lineage metrics), then window the survivors — the sort then
    touches ~2k rows per stratum instead of all of them.  The un-pruned
    form here IS the correctness contract; the prune is a strict filter
    that cannot change the selected set when the bound holds.

    Output: (id, stratum, sample_key, sample_rank ∈ 1..k).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy("sample_key", id_col)
    return (
        df.select(id_col, strata_col, key.alias("sample_key"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )
