"""S3 — the prefix→base-IRI dimension table.

The reference ships a 236-row ``prefixes.csv`` consumed by semsql
(``omop2owl_vocab.py:37,123,126,137``) plus two hardcoded entries
(``PREFIX_MAP``, ``:38-41``).  Our engine constructs CURIEs correctly from
the start, so the dim is only needed for IRI expansion in text sinks and
the output manifest — load it from any user-supplied csv, always overlaid
with the hardcoded pair, and broadcast it when joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from omop2owl_vocab_spark.functions.curie import PREFIX_MAP

PREFIX_SCHEMA = StructType(
    [
        StructField("prefix", StringType(), False),
        StructField("base", StringType(), False),
    ]
)


def load_prefix_map(spark: SparkSession, csv_path: str | None = None) -> dict[str, str]:
    """Driver-side dict (the dim is tiny — a dict beats a join)."""
    out = dict(PREFIX_MAP)
    if csv_path:
        rows = (
            spark.read.schema(PREFIX_SCHEMA)
            .option("header", True)
            .csv(csv_path)
            .collect()
        )
        for r in rows:
            out.setdefault(r["prefix"], r["base"])
    return out


def prefix_dim(spark: SparkSession, csv_path: str | None = None) -> DataFrame:
    """Broadcast-ready DataFrame form, for join-based IRI expansion."""
    m = load_prefix_map(spark, csv_path)
    df = spark.createDataFrame(sorted(m.items()), PREFIX_SCHEMA)
    return F.broadcast(df)
