"""The end-to-end corpus curation decision — what a training-data
pipeline actually joins against before tokenization:

    gopher rules ∧ repetition rules ∧ not-an-exact-duplicate ∧
    near-dup-group representative  →  keep

One row per document with the per-stage verdicts (so drops are
attributable, not silent) and the final ``keep``.  Composes the
already-oracle-verified operators; every stage is the linear-scale shape:

- ``gopher_flags`` / ``repetition_flags``: narrow projections (+ the
  bigram-mode aggregate);
- ``exact_duplicates``: one hash-aggregate on md5(text) — a doc is kept
  only if it is not a non-canonical member of a byte-identical group;
- ``near_duplicate_groups``: LSH → verify → CC; a doc is kept only if it
  IS its group's representative (minimum id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.dedup import (
    exact_duplicates,
    near_duplicate_groups,
)
from omop2owl_vocab_spark.operators.text import gopher_flags, repetition_flags


def curation_decision(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    cc_checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, quality_ok, repetition_ok, exact_canonical, near_dup_rep,
    keep) — the keep-list with per-stage reasons."""
    quality = gopher_flags(df, text_col, id_col).select(
        F.col(id_col), F.col("keep").alias("quality_ok")
    )
    rep = repetition_flags(df, text_col, id_col).select(
        F.col(id_col),
        (F.col("dup_line_ok") & F.col("top_bigram_ok")).alias("repetition_ok"),
    )
    exact_dups = exact_duplicates(df, text_col, id_col).select(
        F.col("dup_id").alias(id_col), F.lit(False).alias("exact_canonical")
    )
    groups = near_duplicate_groups(
        df,
        threshold=jaccard_threshold,
        hash_family=hash_family,
        max_bucket_size=max_bucket_size,
        text_col=text_col,
        id_col=id_col,
        cc_checkpoint_dir=cc_checkpoint_dir,
    ).select(
        F.col("doc_id").alias(id_col),
        (F.col("doc_id") == F.col("group_id")).alias("near_dup_rep"),
    )
    out = (
        quality.join(rep, id_col)
        .join(exact_dups, id_col, "left")
        .join(groups, id_col)
        .withColumn("exact_canonical", F.coalesce("exact_canonical", F.lit(True)))
    )
    return out.select(
        id_col,
        "quality_ok",
        "repetition_ok",
        "exact_canonical",
        "near_dup_rep",
        (
            F.col("quality_ok")
            & F.col("repetition_ok")
            & F.col("exact_canonical")
            & F.col("near_dup_rep")
        ).alias("keep"),
    )
