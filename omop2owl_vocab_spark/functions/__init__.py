from omop2owl_vocab_spark.functions.sanitize import (
    sanitize_predicate_col,
    sanitize_predicate_py,
)
from omop2owl_vocab_spark.functions.curie import omop_curie

__all__ = ["sanitize_predicate_col", "sanitize_predicate_py", "omop_curie"]
