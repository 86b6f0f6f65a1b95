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


def test_reverse_mapping_compat_closed_form(spark):
    """'RxNorm inverse is a' (rxnorm preset path): subject/object swap with
    the reference's asymmetric endpoint rules — F6 filters the PRE-swap
    subject, and the emission loop implies the POST-swap subject must be a
    concept row.  Engine vs the pandas transcription on a corpus crafted
    to hit all three cases (fixtures contain no reverse rows)."""
    import pandas as pd
    from pyspark.sql import Row

    from omop2owl_vocab_spark.operators.emit import emit_triples
    from tests.oracle_ref import precision_recall, reference_triples

    cols = dict(
        concept_name="n", domain_id="d", vocabulary_id="RxNorm",
        concept_class_id="k", standard_concept="S",
        valid_start_date="", valid_end_date="", invalid_reason="",
    )
    concept_pd = pd.DataFrame(
        [
            {"concept_id": "1", "concept_code": "1", **cols},
            {"concept_id": "2", "concept_code": "2", **cols},
        ]
    ).set_index("concept_id")
    edges_rows = [
        # kept: both endpoints are concepts → (2 subClassOf 1) post-swap
        ("1", "2", "RxNorm inverse is a"),
        # dropped by F6: pre-swap subject 3 is not a concept
        ("3", "1", "RxNorm inverse is a"),
        # dropped at emission: post-swap subject 3 is not a concept row
        ("1", "3", "RxNorm inverse is a"),
        # forward rel for contrast: kept with dangling object (R7)
        ("1", "3", "Maps to"),
    ]
    rel_pd = pd.DataFrame(
        edges_rows,
        columns=["concept_id_1", "concept_id_2", "relationship_id"],
    ).assign(valid_start_date="", valid_end_date="", invalid_reason="")

    oracle = reference_triples(
        concept_pd, rel_pd, relationships=["RxNorm inverse is a", "Maps to"]
    )
    assert ("OMOP:2", "rdfs:subClassOf", "OMOP:1") in oracle
    assert not any(s == "OMOP:3" for s, _, _ in oracle)

    concepts = spark.createDataFrame(
        [
            Row(concept_id=cid, concept_name="n", domain_id="d",
                vocabulary_id="RxNorm", concept_class_id="k",
                standard_concept="S", concept_code=cid,
                valid_start_date="", valid_end_date="", invalid_reason="")
            for cid in ("1", "2")
        ]
    )
    edges = spark.createDataFrame(
        [
            Row(concept_id_1=a, concept_id_2=b, relationship_id=r,
                valid_start_date="", valid_end_date="", invalid_reason="")
            for a, b, r in edges_rows
        ]
    )
    engine = {
        (r["subj"], r["pred"], r["obj"])
        for r in emit_triples(
            concepts, edges, relationships=["RxNorm inverse is a", "Maps to"]
        ).select("subj", "pred", "obj").collect()
    }
    p, r = precision_recall(engine, oracle)
    assert (p, r) == (1.0, 1.0), (
        sorted(engine - oracle), sorted(oracle - engine)
    )
