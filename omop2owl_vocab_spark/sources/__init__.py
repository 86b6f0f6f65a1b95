from omop2owl_vocab_spark.sources.omop import (
    read_concept,
    read_concept_relationship,
)
from omop2owl_vocab_spark.sources.code_files import read_code_files
from omop2owl_vocab_spark.sources.synth import synth_code_files

__all__ = [
    "read_concept",
    "read_concept_relationship",
    "read_code_files",
    "synth_code_files",
]
