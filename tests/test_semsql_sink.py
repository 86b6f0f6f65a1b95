"""K3 parity: SQLite statements db matches the emitted triple set and the
reference's own e2e assertions (test_omop2owl.py:127-129 shape)."""

import glob
import sqlite3

import pytest

from omop2owl_vocab_spark.operators.emit import emit_triples
from omop2owl_vocab_spark.operators.semsql import write_semsql_sqlite
from omop2owl_vocab_spark.sources.omop import (
    read_concept,
    read_concept_relationship,
)

FIXTURE_DIR = "/root/reference/test/input"


def test_semsql_statements_roundtrip(spark, tmp_path):
    concept = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept.csv"))
    rel = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept_relationship.csv"))
    triples = emit_triples(
        read_concept(spark, concept),
        read_concept_relationship(spark, rel),
        relationships=["ALL"],
    )
    db = str(tmp_path / "OMOP.db")
    n = write_semsql_sqlite(triples, db)

    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM statements").fetchone()[0] == n

    # the reference's own e2e assertions, expressed over statements
    entities = con.execute(
        "SELECT COUNT(DISTINCT subject) FROM statements "
        "WHERE predicate = 'rdf:type'"
    ).fetchone()[0]
    rels = con.execute(
        "SELECT COUNT(*) FROM statements WHERE object IS NOT NULL "
        "AND predicate != 'rdf:type'"
    ).fetchone()[0]
    sc = con.execute(
        "SELECT COUNT(*) FROM statements WHERE predicate = 'rdfs:subClassOf'"
    ).fetchone()[0]
    assert entities == 100
    assert rels > 50
    assert sc > 0

    # literals land in value with datatype, objects in object
    lit = con.execute(
        "SELECT value FROM statements WHERE predicate = 'rdfs:label' LIMIT 1"
    ).fetchone()
    assert lit and lit[0]
    assert con.execute("SELECT COUNT(*) FROM prefix").fetchone()[0] >= 2
    con.close()


def test_semsql_row_bound(spark, tmp_path):
    concept = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept.csv"))
    rel = sorted(glob.glob(f"{FIXTURE_DIR}/*/concept_relationship.csv"))
    triples = emit_triples(
        read_concept(spark, concept), read_concept_relationship(spark, rel)
    )
    with pytest.raises(ValueError, match="exceed"):
        write_semsql_sqlite(triples, str(tmp_path / "x.db"), max_rows=5)
