from omop2owl_vocab_spark.operators.emit import (
    emit_concept_triples,
    resolve_edges,
    emit_edge_triples,
    emit_triples,
    exclude_singleton_concepts,
)
from omop2owl_vocab_spark.operators.link import connected_components, canonical_map
from omop2owl_vocab_spark.operators.canon import canonicalize_triples

__all__ = [
    "emit_concept_triples",
    "resolve_edges",
    "emit_edge_triples",
    "emit_triples",
    "exclude_singleton_concepts",
    "connected_components",
    "canonical_map",
    "canonicalize_triples",
]
