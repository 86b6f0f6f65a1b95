"""JSONL corpus source — the interchange format web-scale text
pipelines actually ship (The Pile / Dolma / RedPajama-style one JSON
object per line), read with an EXPLICIT schema so Spark never runs the
double-scan inference pass, plus a quarantine lane for malformed
lines.

Scale posture: JSON Lines is splittable (newline-delimited), so a
multi-TB shard set parallelizes file-by-file and block-by-block like
any text source.  The read is ``spark.read.text`` + one ``from_json``
projection rather than the built-in json source's
``_corrupt_record`` machinery: Spark refuses corrupt-column-only
queries on raw json scans unless the parse is CACHED first
(QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching a 100 TB corpus to
inspect its bad lines is exactly the wrong trade — with the
text+from_json form both the clean and the quarantine frame are plain
prunable projections over the same splittable scan, no persisted
state.  Malformed records are never silently dropped or nulled: a
corrupt-record field INSIDE the ``from_json`` schema marks them (the
PERMISSIVE all-null-struct result is indistinguishable from a valid
all-null object — the embedded corrupt column is the reliable signal),
and the raw line survives in
the quarantine frame — the production contract is "count and inspect
the bad lines" (same error-hygiene stance as ``plans/pipeline.py``'s
atomic writes).

Reference analog: none (the reference reads OMOP CSV only —
omop2owl_vocab.py:379-391); mandated pipeline-source surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents corpus → ``(docs, quarantine)``.

    ``docs`` carries the clean rows in the canonical documents shape
    (doc_id, text, lang, source, n_chars); ``quarantine`` carries one
    row per malformed line (``line`` = the raw text) for counting and
    inspection.  A line is quarantined when it fails to PARSE; parsed
    lines with missing fields keep their NULLs — field-level
    normalization (`F1`-style na.fill) is the caller's downstream
    choice, exactly as with the parquet source.
    """
    parse_schema = StructType(
        list(DOCUMENTS_JSONL_SCHEMA.fields)
        + [StructField("_corrupt", StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
    )
    # a line that parses to a NULL struct (blank line, literal `null`)
    # is malformed too — without the j IS NOT NULL guard it would slip
    # past the corrupt check as a phantom all-null document row
    bad = F.col("j").isNull() | F.col("j._corrupt").isNotNull()
    docs = parsed.filter(~bad).select(
        *[f"j.{f.name}" for f in DOCUMENTS_JSONL_SCHEMA.fields]
    )
    quarantine = parsed.filter(bad).select(F.col("value").alias("line"))
    return docs, quarantine


def write_documents_jsonl(
    df: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Write a documents frame as JSONL shards (one JSON object per
    line, one file per partition — the shard layout downstream
    tokenizer/pack stages consume)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
