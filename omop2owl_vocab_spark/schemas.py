"""Explicit schemas — never infer (reference forces all-string dtypes,
``omop2owl_vocab.py:42-61``; we declare StructTypes instead).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# Mirrors CONCEPT_DTYPES (omop2owl_vocab.py:42-53): every column string —
# ids/dates are "serialized, not manipulated", and string keeps exact parity
# with the reference's CURIE rendering (no int round-trip surprises).
CONCEPT_COLUMNS = [
    "concept_id",
    "concept_name",
    "domain_id",
    "vocabulary_id",
    "concept_class_id",
    "standard_concept",
    "concept_code",
    "valid_start_date",
    "valid_end_date",
    "invalid_reason",
]
CONCEPT_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in CONCEPT_COLUMNS]
)

# Mirrors CONCEPT_RELATIONSHIP_DTYPES (omop2owl_vocab.py:54-61).
CONCEPT_RELATIONSHIP_COLUMNS = [
    "concept_id_1",
    "concept_id_2",
    "relationship_id",
    "valid_start_date",
    "valid_end_date",
    "invalid_reason",
]
CONCEPT_RELATIONSHIP_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in CONCEPT_RELATIONSHIP_COLUMNS]
)

# Grafted primary input (BASELINE.json input_hint): Iceberg/parquet table of
# source-code repositories.
CODE_FILES_SCHEMA = StructType(
    [
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

# Output triple table (SURVEY.md §1.4 / FIXTURES.md §4). Partitioned by
# vocabulary_id on write; src_sha256 is the per-row invariant carried from
# the source (empty for compat-corpus runs where no content exists).
TRIPLES_COLUMNS = [
    "subj",
    "pred",
    "obj",
    "obj_is_literal",
    "vocabulary_id",
    "src_sha256",
]
TRIPLES_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), True),
        StructField("obj_is_literal", BooleanType(), False),
        StructField("vocabulary_id", StringType(), True),
        StructField("src_sha256", StringType(), True),
    ]
)

# The 8 annotation-property columns emitted as OMOP:<attr> triples
# (ROBOT_SUBHEADER, omop2owl_vocab.py:66-73).
ANNOTATION_COLUMNS = [
    "domain_id",
    "vocabulary_id",
    "concept_class_id",
    "standard_concept",
    "concept_code",
    "valid_start_date",
    "valid_end_date",
    "invalid_reason",
]
