"""Streaming twins of the stateless curation projections (r4 verdict #7):
``pii_scrub`` + ``domain_flags`` + ``gopher_flags`` over a documents
stream.

All three are pure per-row projections — no state, no watermark, no
aggregation — so they stream verbatim: the SAME operator code compiles
into the micro-batch plan unchanged, and stream output == batch output
row-for-row (test-pinned in ``tests/test_streaming_curate.py``).

``curation_scan`` fuses the three into ONE projection chain with zero
joins and zero shuffles: instead of running each operator separately and
joining their id-keyed outputs (3 scans + 2 shuffles per micro-batch —
and a stream-stream self-join hazard), each operator is fed the previous
stage's accumulated columns packed into its ``id_col`` as a struct, with
the text column re-exposed from the accumulator.  Every step is a cheap
alias/struct projection, so Catalyst's CollapseProject folds the chain
into a single whole-stage-codegen'd select over one scan — the identical
shape in batch and streaming mode, at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from omop2owl_vocab_spark.operators.text import (
    domain_flags,
    gopher_flags,
    pii_scrub,
)

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)

_PII_COLS = ["n_emails", "n_ipv4", "has_pii", "redacted"]
_DOM_COLS = ["n_urls", "n_blocked_domains", "blocked", "domains_csv"]
_GOPHER_COLS = [
    "word_count_ok",
    "mean_word_len_ok",
    "symbol_ratio_ok",
    "bullet_ratio_ok",
    "ellipsis_ratio_ok",
    "alpha_ratio_ok",
    "stopword_ok",
    "keep",
]


def curation_scan(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The fused stateless curation projection — PII counts + scrub,
    URL-domain verdicts, and Gopher quality flags in one single-scan,
    join-free select.  Works identically on batch and streaming frames
    (pure projection); column set is the union of the three operators'
    outputs keyed by ``id_col``.
    """
    base = df.select(
        F.struct(F.col(id_col).alias("_cid"), F.col(text_col).alias("_ctext"))
        .alias("_k"),
        F.col(text_col),
    )
    p = pii_scrub(base, text_col=text_col, id_col="_k")
    p2 = p.select(
        F.struct(F.col("_k"), *[F.col(c) for c in _PII_COLS]).alias("_k2"),
        F.col("_k._ctext").alias(text_col),
    )
    d = domain_flags(p2, blocklist, text_col=text_col, id_col="_k2")
    d2 = d.select(
        F.struct(F.col("_k2"), *[F.col(c) for c in _DOM_COLS]).alias("_k3"),
        F.col("_k2._k._ctext").alias(text_col),
    )
    g = gopher_flags(d2, text_col=text_col, id_col="_k3")
    return g.select(
        F.col("_k3._k2._k._cid").alias(id_col),
        *[F.col(f"_k3._k2.{c}").alias(c) for c in _PII_COLS],
        *[F.col(f"_k3.{c}").alias(c) for c in _DOM_COLS],
        *_GOPHER_COLS,
    )


def curation_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    blocklist: list[str],
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream documents parquet → fused curation verdicts, append-only.

    A plain stateless projection stream — no watermark, no state store;
    exactly-once lands on the parquet sink's transaction log.  Run with
    ``availableNow`` for catch-up batch runs or continuously for ingest.
    """
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    verdicts = curation_scan(stream, blocklist)
    writer = (
        verdicts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
