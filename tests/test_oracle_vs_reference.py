"""Ground-truth check: execute the REFERENCE's own relationship-map builder
(read-only import from /root/reference) and assert our pandas oracle's
edge emission agrees with it on the fixture corpus.

This pins the oracle to the reference implementation itself, so the
engine-vs-oracle P/R gate transitively measures engine-vs-reference.
(The reference's robot/semsql stages can't run here — robot.jar is a
missing blob — but everything up to rel-map construction can.)
"""

import glob
import sys

import pytest

sys.path.insert(0, "/root/reference")

from tests.oracle_ref import load_tables, reference_triples

try:
    from omop2owl_vocab.omop2owl_vocab import _get_relationship_maps
except ImportError:  # pragma: no cover
    _get_relationship_maps = None

FIXTURE_DIR = "/root/reference/test/input"


@pytest.mark.skipif(
    _get_relationship_maps is None, reason="reference module not importable"
)
@pytest.mark.parametrize("relationships", [["ALL"], ["Is a"], ["Is a", "Maps to"]])
def test_oracle_edges_match_reference_execution(relationships):
    concept_paths = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept.csv"))
    rel_paths = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept_relationship.csv"))
    concept_df, rel_df = load_tables(concept_paths, rel_paths)
    concept_ids = set(concept_df.index)

    ref_maps = _get_relationship_maps(
        rel_df.copy(), list(relationships), concept_ids
    )
    ref_edges = {
        (subj, pred, obj)
        for pred, adj in ref_maps.items()
        for subj, objs in adj.items()
        for obj in objs
        if subj in concept_ids  # template loop emits only concept rows
    }

    oracle_edges = {
        (s.removeprefix("OMOP:"), p, o.removeprefix("OMOP:"))
        for s, p, o in reference_triples(
            concept_df, rel_df, relationships=relationships
        )
        if p == "rdfs:subClassOf" or p.startswith("omoprel:")
    }
    assert oracle_edges == ref_edges
