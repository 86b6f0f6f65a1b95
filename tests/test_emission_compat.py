"""The P/R gate (SURVEY §5.2): engine triples vs the pandas oracle on the
reference's own fixture CSVs.  Target P=R=1.0; requirement ≥0.95."""

import glob

import pytest

from omop2owl_vocab_spark.operators.emit import emit_triples
from omop2owl_vocab_spark.sources.omop import (
    read_concept,
    read_concept_relationship,
)
from tests.oracle_ref import load_tables, precision_recall, reference_triples

FIXTURE_DIR = "/root/reference/test/input"


def _fixture_paths():
    concept = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept.csv"))
    rel = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept_relationship.csv"))
    assert len(concept) == 5 and len(rel) == 5
    return concept, rel


def _engine_triples(spark, relationships, vocabs=None) -> set:
    concept_paths, rel_paths = _fixture_paths()
    concepts = read_concept(spark, concept_paths)
    edges = read_concept_relationship(spark, rel_paths)
    if vocabs:
        from pyspark.sql import functions as F

        concepts = concepts.filter(F.col("vocabulary_id").isin(vocabs))
    df = emit_triples(concepts, edges, relationships=relationships)
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def _oracle_triples(relationships, vocabs=None) -> set:
    concept_paths, rel_paths = _fixture_paths()
    concept_df, rel_df = load_tables(concept_paths, rel_paths)
    return reference_triples(
        concept_df, rel_df, relationships=relationships, vocabs=vocabs
    )


@pytest.mark.parametrize(
    "relationships,vocabs",
    [
        (["ALL"], None),          # the reference's own e2e test config
        (["Is a"], None),         # the reference's default
        (["ALL"], ["RxNorm", "SNOMED"]),   # R8 scoping
        (["Is a", "Maps to", "Subsumes"], None),
    ],
)
def test_compat_pr(spark, relationships, vocabs):
    engine = _engine_triples(spark, relationships, vocabs)
    oracle = _oracle_triples(relationships, vocabs)
    p, r = precision_recall(engine, oracle)
    assert p >= 0.95 and r >= 0.95, (p, r, len(engine), len(oracle))
    # exact-match target: any drift below 1.0 is a regression to investigate
    assert p == 1.0 and r == 1.0, (
        sorted(engine - oracle)[:10],
        sorted(oracle - engine)[:10],
    )


def test_reference_own_assertions(spark):
    """The reference's e2e asserts (test_omop2owl.py:127-129): >100 entities,
    >50 relationship triples, rdfs:subClassOf present."""
    engine = _engine_triples(spark, ["ALL"])
    entities = {s for s, p, o in engine if p == "rdf:type"}
    sc = [(s, o) for s, p, o in engine if p == "rdfs:subClassOf"]
    rel_triples = [
        (s, p, o) for s, p, o in engine if p.startswith("omoprel:") or p == "rdfs:subClassOf"
    ]
    assert len(entities) == 100
    assert len(rel_triples) > 50
    assert len(sc) > 0
