"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM, whole-stage
codegen).  Float-valued scores are returned as ``floor(x*10⁴ + 0.5)``
integers (``*_e4``) so cross-engine comparison (DuckDB oracle) is exact —
double rounding modes differ between engines, integer arithmetic doesn't.

Designed for 100 TB corpora: every operator is a narrow projection (no
shuffle); token/shingle explosion happens only inside dedup/similarity
operators that need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic; deliberately small so the same logic is expressible in SQL
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "de", "que"],
}


def _e4(x: Column) -> Column:
    """Deterministic 4-decimal fixed-point: identical in Spark and DuckDB."""
    return F.floor(x * 10000 + F.lit(0.5)).cast("long")


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, BPE-ish subword count (4-chars-per-token
    heuristic over non-space chars), char count."""
    text = F.col(text_col)
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    # GPT-style pre-tokenizer shape: word runs and single punctuation marks
    pieces = F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0)
    return df.select(
        F.col(id_col),
        F.size(_tokens(text)).cast("long").alias("n_tokens"),
        F.ceil(nonspace / 4).cast("long").alias("n_subwords"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.length(text).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-token-length
    quality signals (the usual pre-training filters)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    toks = _tokens(text)
    n_tokens = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*LANG_MARKERS["en"]))
    )
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        _e4(n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio_e4"),
        _e4(n_stop / safe_tokens).alias("stopword_ratio_e4"),
        _e4(
            F.length(F.regexp_replace(text, r"\s", "")) / safe_tokens
        ).alias("mean_token_len_e4"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-lexicon language guess: the language with the most marker-word
    hits wins; ties broken by language code order; 'und' if no hits.

    Implemented as a greatest-of-structs expression — one projection, no
    shuffle, no UDF.
    """
    toks = F.transform(_tokens(F.col(text_col)), lambda t: F.lower(t))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    # pick argmax deterministically: greatest (score, reverse-alphabetic lang)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS, reverse=True)
        ]
    )
    return scored.select(
        F.col(id_col),
        F.when(best["s"] > 0, best["lang"]).otherwise("und").alias("lang_guess"),
        best["s"].cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized text (md5 is
    bit-identical across engines, unlike xxhash64 vs DuckDB hash()), plus a
    16-bucket shard key from the first hex nibble."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    fp = F.md5(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 1), 16, 10).cast("long").alias("fp_bucket"),
    )
