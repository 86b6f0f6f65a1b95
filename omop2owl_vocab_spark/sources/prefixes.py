"""S3 — the prefix→base-IRI dimension table.

The reference ships a 235-row ``prefixes.csv`` (234 unique prefixes —
``FBcv`` appears twice upstream; the dict keeps the last) consumed by semsql
(``omop2owl_vocab.py:37,123,126,137``) plus two hardcoded entries
(``PREFIX_MAP``, ``:38-41``).  That csv is BUNDLED verbatim at
``omop2owl_vocab_spark/data/prefixes.csv`` (public prefix→IRI data, not
code — the reference's semsql ``.db`` carries these rows, and downstream
tools expanding foreign CURIEs through the prefix table expect them).
``load_prefix_map`` overlays bundled < user csv < hardcoded pair; the dim
is broadcast when joined.
"""

from __future__ import annotations

import csv
import os
from functools import lru_cache

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

BUNDLED_PREFIXES_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "prefixes.csv",
)


@lru_cache(maxsize=1)
def bundled_prefix_map() -> dict[str, str]:
    """The reference's full prefix dim, read driver-side (tiny, stdlib csv
    — no Spark job for a 235-row constant file)."""
    with open(BUNDLED_PREFIXES_CSV, newline="") as f:
        return {row["prefix"]: row["base"] for row in csv.DictReader(f)}


def default_prefix_map() -> dict[str, str]:
    """THE default prefix table for emitted artifacts (semsql ``.db``,
    manifest) — single source so sinks can't drift from the dim:
    bundled csv overlaid by the hardcoded pair (same precedence as
    ``load_prefix_map`` with no user csv)."""
    return {**bundled_prefix_map(), **PREFIX_MAP}


def load_prefix_map(
    spark: SparkSession,
    csv_path: str | None = None,
    include_bundled: bool = True,
) -> dict[str, str]:
    """Driver-side dict (the dim is tiny — a dict beats a join).

    Precedence: hardcoded ``PREFIX_MAP`` > user csv > bundled csv (the
    reference also lets its csv-loaded entries be shadowed by the
    hardcoded pair, omop2owl_vocab.py:38-41)."""
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
    if include_bundled:
        for k, v in bundled_prefix_map().items():
            out.setdefault(k, v)
    return out


def prefix_dim(spark: SparkSession, csv_path: str | None = None) -> DataFrame:
    """Broadcast-ready DataFrame form, for join-based IRI expansion."""
    m = load_prefix_map(spark, csv_path)
    df = spark.createDataFrame(sorted(m.items()), PREFIX_SCHEMA)
    return F.broadcast(df)
