"""omop2owl_vocab_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression (NOT a port) of the query/data-processing
capabilities of ``timsbiomed/omop2owl-vocab`` (reference at
``/root/reference``, a single-module pandas CLI that shells out to
robot.jar/semsql).  Here the whole pipeline — triple extraction, entity
linking/canonicalization, graph materialization — is one lazy Spark
DataFrame DAG planned by Catalyst:

    scan → derive → prepare → emit → link → canonicalize → materialize

Public API mirrors the reference's library surface
(``omop2owl_vocab/__init__.py:4``): ``omop2owl`` ≈ ``run_pipeline``.
"""

from omop2owl_vocab_spark.schemas import (
    CONCEPT_SCHEMA,
    CONCEPT_RELATIONSHIP_SCHEMA,
    CODE_FILES_SCHEMA,
    TRIPLES_COLUMNS,
)
from omop2owl_vocab_spark.session import get_spark
from omop2owl_vocab_spark.plans.pipeline import run_pipeline
from omop2owl_vocab_spark.api import omop2owl

__all__ = [
    "CONCEPT_SCHEMA",
    "CONCEPT_RELATIONSHIP_SCHEMA",
    "CODE_FILES_SCHEMA",
    "TRIPLES_COLUMNS",
    "get_spark",
    "run_pipeline",
    "omop2owl",
]

__version__ = "0.1.0"
