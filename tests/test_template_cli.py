"""K1 robot-template sink, N-Triples sink, and CLI routing."""

import glob
import json

from pyspark.sql import Row

from omop2owl_vocab_spark.operators.template import (
    to_ntriples,
    to_robot_template,
    write_robot_template_tsv,
)


def _triples(spark):
    rows = [
        Row(subj="OMOP:1", pred="rdf:type", obj="owl:Class",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="rdfs:label", obj='say "hi"',
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="OMOP:domain_id", obj="Drug",
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="rdfs:subClassOf", obj="OMOP:2",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="rdfs:subClassOf", obj="OMOP:3",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="omoprel:Maps_to", obj="OMOP:9",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
    ]
    return spark.createDataFrame(rows)


def test_robot_template_wide_form(spark):
    wide, subheader = to_robot_template(_triples(spark))
    row = wide.collect()[0].asDict()
    assert row["ID"] == "OMOP:1"
    assert row["Type"] == "class"
    assert row["rdfs:subClassOf"] == "OMOP:2|OMOP:3"  # pipe-joined, sorted
    assert row["omoprel:Maps_to"] == "OMOP:9"
    assert subheader["rdfs:subClassOf"] == "SC % SPLIT=|"
    assert subheader["omoprel:Maps_to"] == "SC omoprel:Maps_to some % SPLIT=|"


def test_robot_template_tsv_sink(spark, tmp_path):
    out = str(tmp_path / "template")
    write_robot_template_tsv(_triples(spark), out)
    f = glob.glob(f"{out}/part-*.csv")[0]
    lines = open(f).read().splitlines()
    assert lines[0].startswith("ID\tLabel\tType")       # header
    assert lines[1].startswith("ID\tA rdfs:label\tTYPE")  # magic subheader
    assert "OMOP:2|OMOP:3" in lines[2]


def test_ntriples_rendering(spark):
    lines = {r["line"] for r in to_ntriples(_triples(spark)).collect()}
    assert (
        "<https://athena.ohdsi.org/search-terms/terms/1> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://www.w3.org/2002/07/owl#Class> ." in lines
    )
    # literal with quotes escaped
    assert any('"say \\"hi\\""' in ln for ln in lines)


def test_cli_omop_mode(spark, tmp_path):
    from omop2owl_vocab_spark.cli import cli_parser, route_and_run

    concept = sorted(glob.glob("/root/reference/test/input/*/concept.csv"))[0]
    rel = concept.replace("concept.csv", "concept_relationship.csv")
    out = str(tmp_path / "cli_out")
    d = vars(
        cli_parser().parse_args(
            ["-c", concept, "-r", rel, "-O", out, "-R", "ALL",
             "--no-canonicalize", "--master", "local[4]"]
        )
    )
    report = route_and_run(d)
    assert report["output"].endswith("triples")
    manifest = json.load(open(f"{out}/_manifest.json"))
    assert manifest["ontology_iri"].endswith("/OMOP/ontology")
    assert spark.read.parquet(report["output"]).count() > 0
