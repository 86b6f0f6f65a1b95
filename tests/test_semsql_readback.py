"""Downstream-compat parity with the reference's own semsql readback test.

The reference validates its output by loading the .db with
``oaklib.get_adapter`` and asserting entity/relationship counts
(``/root/reference/test/test_omop2owl.py:123-130``).  This test replays the
reference's exact scenario — the 5 fixture vocabs combined, relationships
'ALL', default output — against this engine's ``omop2owl(**settings)`` and
then:

- if oaklib is importable, performs the identical adapter readback;
- otherwise (this sandbox), runs the same queries oaklib's
  SqlImplementation issues against the ``statements`` table directly, plus
  a schema-contract check (tables, columns, indexes) so the .db stays
  loadable by oaklib outside the sandbox.
"""

import glob
import sqlite3

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def combined_fixture(tmp_path_factory):
    """Reference's _prep_combine_test_subsets (test_omop2owl.py:59-89):
    concat the 5 per-vocab fixture CSVs into one concept/relationship pair."""
    outdir = tmp_path_factory.mktemp("combined_inputs")
    cdfs = [
        pd.read_csv(p, dtype=str)
        for p in sorted(glob.glob("/root/reference/test/input/*/concept.csv"))
    ]
    rdfs = [
        pd.read_csv(p, dtype=str)
        for p in sorted(
            glob.glob("/root/reference/test/input/*/concept_relationship.csv")
        )
    ]
    concept = outdir / "concept.csv"
    rel = outdir / "concept_relationship.csv"
    pd.concat(cdfs).to_csv(concept, index=False)
    pd.concat(rdfs).to_csv(rel, index=False)
    return str(concept), str(rel)


@pytest.fixture(scope="module")
def db_path(spark, combined_fixture, tmp_path_factory):
    from omop2owl_vocab_spark import omop2owl

    concept, rel = combined_fixture
    outdir = tmp_path_factory.mktemp("readback_out")
    # the reference test's exact settings dict (test_omop2owl.py:97-115)
    settings = {
        "concept_csv_path": concept,
        "concept_relationship_csv_path": rel,
        "outdir": str(outdir),
        "use_cache": False,
        "split_by_vocab_merge_after": True,
        "split_by_vocab": True,
        "relationships": "ALL",
    }
    report = omop2owl(spark=spark, **settings)
    assert report["semsql"].endswith("OMOP.db")
    return report["semsql"]


def test_semsql_schema_contract(db_path):
    """Tables/columns/indexes a semsql loader (oaklib SqlImplementation)
    relies on."""
    con = sqlite3.connect(db_path)
    cols = [r[1] for r in con.execute("PRAGMA table_info(statements)")]
    assert cols == [
        "stanza", "subject", "predicate", "object", "value", "datatype",
        "language",
    ]
    pcols = [r[1] for r in con.execute("PRAGMA table_info(prefix)")]
    assert pcols == ["prefix", "base"]
    idx_cols = {
        r[1]: con.execute(f"PRAGMA index_info({r[1]})").fetchall()
        for r in con.execute("PRAGMA index_list(statements)")
    }
    indexed = {info[0][2] for info in idx_cols.values() if info}
    assert {"subject", "predicate"} <= indexed
    prefixes = dict(con.execute("SELECT prefix, base FROM prefix"))
    assert prefixes["OMOP"] == "https://athena.ohdsi.org/search-terms/terms/"
    assert prefixes["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"
    # full bundled-prefixes.csv parity: the reference's .db carries its
    # whole 235-row prefix dim (omop2owl_vocab.py:123,126,137), not just
    # the handful our CURIEs use — downstream CURIE expansion of foreign
    # ids goes through this table
    assert len(prefixes) >= 230, len(prefixes)
    assert prefixes["omoptype"] == "https://w3id.org/cpont/omop/types/"
    assert prefixes["omopclass"] == "https://w3id.org/cpont/omop/classes/"
    assert prefixes["ICD10CM"] == "http://purl.bioontology.org/ontology/ICD10CM/"
    con.close()


def test_semsql_readback_matches_reference_assertions(db_path):
    """The reference's three assertions (test_omop2owl.py:124-130):
    >100 entities, >50 relationships, rdfs:subClassOf among predicates —
    via oaklib when available, else the equivalent statements queries."""
    try:
        from oaklib import get_adapter  # pragma: no cover - not in sandbox

        oi = get_adapter(db_path)
        ids = list(oi.entities(filter_obsoletes=False))
        rels = list(oi.relationships(subjects=ids))
        assert len(ids) > 100
        assert len(rels) > 50
        assert "rdfs:subClassOf" in {r[1] for r in rels}
        return
    except ImportError:
        pass

    con = sqlite3.connect(db_path)
    # oaklib's entities() walks every node, not just stanza subjects —
    # dangling edge targets (objects outside the fixture scope) count too
    n_entities = con.execute(
        "SELECT COUNT(*) FROM (SELECT subject AS e FROM statements "
        "UNION SELECT object FROM statements "
        "WHERE object IS NOT NULL AND object NOT LIKE 'owl:%')"
    ).fetchone()[0]
    n_rels = con.execute(
        "SELECT COUNT(*) FROM statements "
        "WHERE object IS NOT NULL AND predicate != 'rdf:type'"
    ).fetchone()[0]
    rel_preds = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT predicate FROM statements WHERE object IS NOT NULL"
        )
    }
    con.close()
    assert n_entities > 100
    assert n_rels > 50
    assert "rdfs:subClassOf" in rel_preds


def test_semsql_labels_roundtrip(db_path, combined_fixture):
    """Every fixture concept's label must be queryable the way oaklib
    fetches labels (value column, rdfs:label predicate)."""
    concept, _ = combined_fixture
    cdf = pd.read_csv(concept, dtype=str).fillna("")
    con = sqlite3.connect(db_path)
    got = dict(
        con.execute(
            "SELECT subject, value FROM statements WHERE predicate = 'rdfs:label'"
        )
    )
    con.close()
    missing = [
        (cid, name)
        for cid, name in zip(cdf["concept_id"], cdf["concept_name"])
        if name and got.get(f"OMOP:{cid}") != name
    ]
    assert not missing, f"labels missing/mismatched for {missing[:5]}"
