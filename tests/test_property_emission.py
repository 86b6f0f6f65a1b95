"""Property-based compat: random OMOP-shaped tables → engine triples must
equal the pandas-oracle triples exactly, for arbitrary relationship names
(sanitizer stress), dangling endpoints, empty fields, vocab scoping, and
invalid rows.

One Spark round-trip per hypothesis example is slow, so examples are
capped; the generator favors collisions (tiny id space) to hit edge cases.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omop2owl_vocab_spark.operators.emit import emit_triples
from omop2owl_vocab_spark.schemas import (
    CONCEPT_COLUMNS,
    CONCEPT_RELATIONSHIP_COLUMNS,
    CONCEPT_RELATIONSHIP_SCHEMA,
    CONCEPT_SCHEMA,
)
from tests.oracle_ref import precision_recall, reference_triples

IDS = st.sampled_from([str(i) for i in range(1, 13)] + ["999", "1000"])
NAMES = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00\r\n\",\t"),
    max_size=12,
)
REL_NAMES = st.sampled_from(
    [
        "Is a",
        "RxNorm inverse is a",
        "Maps to",
        "SNOMED - ind/CI",
        "a,b|c;d",
        "w/x\\y",
        "odd ~`!@#$%^*+=?'\"()[]{}<> rel",
        "Subsumes",
    ]
)
VOCABS = st.sampled_from(["V1", "V2", ""])

concept_rows = st.lists(
    st.tuples(IDS, NAMES, VOCABS, st.sampled_from(["", "D", "U"])),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)
rel_rows = st.lists(
    st.tuples(IDS, IDS, REL_NAMES, st.sampled_from(["", "", "", "D"])),
    max_size=20,
)


def _frames(concepts, rels):
    cdf = pd.DataFrame(
        [
            {
                "concept_id": cid,
                "concept_name": name,
                "domain_id": "Dom",
                "vocabulary_id": vocab,
                "concept_class_id": "K",
                "standard_concept": "S",
                "concept_code": f"code{cid}",
                "valid_start_date": "2020-01-01",
                "valid_end_date": "",
                "invalid_reason": inv,
            }
            for cid, name, vocab, inv in concepts
        ],
        columns=CONCEPT_COLUMNS,
        dtype=str,
    )
    rdf = pd.DataFrame(
        [
            {
                "concept_id_1": a,
                "concept_id_2": b,
                "relationship_id": r,
                "valid_start_date": "",
                "valid_end_date": "",
                "invalid_reason": inv,
            }
            for a, b, r, inv in rels
        ],
        columns=CONCEPT_RELATIONSHIP_COLUMNS,
        dtype=str,
    )
    return cdf, rdf


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(concepts=concept_rows, rels=rel_rows, vocabs=st.sampled_from([None, ["V1"]]))
def test_random_tables_match_oracle(sess, concepts, rels, vocabs):
    cdf, rdf = _frames(concepts, rels)

    oracle_cdf = cdf.set_index("concept_id")
    oracle_rdf = rdf[rdf.invalid_reason == ""]
    # Q2 guard: the oracle reproduces the reference clobber; our engine
    # deliberately unions (documented divergence), so skip colliding draws
    rels_present = set(oracle_rdf.relationship_id)
    if {"Is a", "RxNorm inverse is a"} <= rels_present:
        oracle_rdf = oracle_rdf[
            oracle_rdf.relationship_id != "RxNorm inverse is a"
        ]
        rdf = rdf[rdf.relationship_id != "RxNorm inverse is a"]
    oracle = reference_triples(
        oracle_cdf, oracle_rdf, relationships=["ALL"], vocabs=vocabs
    )

    sc = sess.createDataFrame(cdf, schema=CONCEPT_SCHEMA)
    se = sess.createDataFrame(rdf, schema=CONCEPT_RELATIONSHIP_SCHEMA).filter(
        "invalid_reason = ''"
    )
    if vocabs:
        sc = sc.filter(sc.vocabulary_id.isin(vocabs))
    engine = {
        (r["subj"], r["pred"], r["obj"])
        for r in emit_triples(sc, se, ["ALL"]).collect()
    }
    p, r = precision_recall(engine, oracle)
    assert (p, r) == (1.0, 1.0), (
        sorted(engine - oracle)[:5],
        sorted(oracle - engine)[:5],
    )
