"""Deduplication operators for training-data pipelines.

Scale posture (100 TB corpus, 10⁹+ docs):

- exact: one hash-aggregate shuffle on a 32-byte key — the cheapest
  possible global dedup; AQE handles the (rare) giant-duplicate-group skew.
- minhash LSH: shingle→minhash→band→bucket-join. Candidate generation is
  linear in corpus size (explode k band keys per doc, groupBy band key);
  only same-bucket pairs are verified, never the n² cross join.
- simhash: 64-bit signature per doc via one Arrow-vectorized pandas UDF
  (the bit-twiddling genuinely doesn't fit builtin exprs); near-dup pairs
  = same value on ≥1 of 4 16-bit bands (Hamming ≤ 3 guarantee).
- n-gram Jaccard: exact verification operator for candidate pairs (and a
  small-scale direct pair finder for tests/oracles).
- embedding cosine: see operators/similarity.py (near-dup = cos ≥ τ).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical docs: (canonical_id, dup_id) pairs,
    canonical = min id per md5 group."""
    hashed = df.select(F.col(id_col).alias("dup_id"), F.md5(F.col(text_col)).alias("h"))
    groups = (
        hashed.groupBy("h")
        .agg(F.min("dup_id").alias("canonical_id"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        hashed.join(groups, "h")
        .filter(F.col("dup_id") != F.col("canonical_id"))
        .select("canonical_id", "dup_id")
    )


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) long form — word n-grams over whitespace tokens."""
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != "")
    # standard shingling: documents with fewer than n tokens produce NO
    # shingles (a truncated sub-n shingle would make two 2-word docs look
    # like jaccard-1.0 near-dups and diverge from the DuckDB oracle)
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles)).alias("shingle")
    ).filter(F.col("shingle") != "")


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(id, sig: array<bigint>) — k seeded xxhash64 min-hashes in one
    aggregate pass (no per-hash rescan)."""
    hashes = F.array(
        *[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_hashes)]
    )
    return (
        shingled.select("id", hashes.alias("hs"))
        .groupBy("id")
        .agg(
            F.array(
                *[F.min(F.element_at("hs", i + 1)) for i in range(num_hashes)]
            ).alias("sig")
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8
) -> DataFrame:
    """Band the signature, bucket-join: pairs agreeing on ≥1 band.
    Output (id_a, id_b) with id_a < id_b, distinct."""
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"),
                                    b * (F.size("sig") / bands).cast("int") + 1,
                                    (F.size("sig") / bands).cast("int"),
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all co-shingle pairs
    when ``candidates`` is None — small-scale/oracle path only).

    Returns (id_a, id_b, jaccard_e4). Intersection via a self-join on
    shingle; union = |A|+|B|-∩. The no-candidates form is the textbook
    inverted-index join: only pairs sharing ≥1 shingle are ever materialized.
    """
    sizes = shingled.groupBy("id").agg(F.count("*").alias("sz"))
    if candidates is not None:
        # prune BEFORE the self-join: restrict each side to ids that appear
        # in any candidate pair, and drop non-candidate pairs before the
        # aggregation — otherwise the full co-shingle blowup (the thing LSH
        # exists to avoid) happens anyway and is discarded afterwards
        cand_ids = (
            candidates.select(F.col("id_a").alias("id"))
            .unionByName(candidates.select(F.col("id_b").alias("id")))
            .distinct()
        )
        shingled = shingled.join(cand_ids, "id", "left_semi")
    a = shingled.alias("sa")
    b = shingled.alias("sb")
    pair_stream = (
        a.join(b, F.col("sa.shingle") == F.col("sb.shingle"))
        .filter(F.col("sa.id") < F.col("sb.id"))
        .select(F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b"))
    )
    if candidates is not None:
        pair_stream = pair_stream.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = pair_stream.groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("jaccard_e4", F.floor(jac * 10000 + F.lit(0.5)).cast("long"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", "jaccard_e4")
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc — Arrow-vectorized pandas UDF (weighted
    bit-vote over token hashes; genuinely awkward as builtin exprs).
    Deterministic: hash = md5 of token, no randomness."""
    from pyspark.sql.functions import pandas_udf

    # NB: annotation must resolve from module globals (PEP 563 strings) —
    # hence the module-level pandas import.
    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib
        from collections import Counter

        import numpy as np

        # per-batch token→±1-bit-vector cache: corpora repeat tokens heavily,
        # so hashing each distinct token once dominates the constant factor
        cache: dict[str, np.ndarray] = {}

        def tok_bits(tok: str) -> np.ndarray:
            v = cache.get(tok)
            if v is None:
                hv = hashlib.md5(tok.encode()).digest()[:8]
                bits = np.unpackbits(
                    np.frombuffer(hv, dtype=np.uint8), bitorder="little"
                )
                v = bits.astype(np.int32) * 2 - 1  # ±1 votes, bit i = (h>>i)&1
                cache[tok] = v
            return v

        powers = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            votes = np.zeros(64, dtype=np.int64)
            for tok, cnt in Counter((t or "").lower().split()).items():
                votes += cnt * tok_bits(tok)
            sig = int((powers[votes > 0]).sum(dtype=np.uint64))
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash")
    )


def simhash_near_duplicates(signatures: DataFrame) -> DataFrame:
    """Candidate near-dups: equal on ≥1 of 4 16-bit bands (catches all
    pairs with Hamming distance ≤ 3). Same bucket-join shape as LSH."""
    bands = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
