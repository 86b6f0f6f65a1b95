"""K2 parity sink: RDF/XML OWL artifact — structure, escaping, robot
'SC .. some' restriction expansion, and loadability by a strict XML parser."""

import xml.etree.ElementTree as ET

from pyspark.sql import Row

from omop2owl_vocab_spark.operators.owl import write_owl_rdfxml

RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
OWL = "{http://www.w3.org/2002/07/owl#}"
OMOP_BASE = "https://athena.ohdsi.org/search-terms/terms/"
OMOPREL_BASE = "https://w3id.org/cpont/omop/relations/"


def _triples(spark):
    rows = [
        Row(subj="OMOP:1", pred="rdf:type", obj="owl:Class",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="rdfs:label", obj='A & B <"tricky">',
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="OMOP:domain_id", obj="Drug",
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="rdfs:subClassOf", obj="OMOP:2",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="omoprel:Maps_to", obj="OMOP:9",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:2", pred="rdf:type", obj="owl:Class",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:2", pred="rdfs:label", obj="parent",
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
    ]
    return spark.createDataFrame(rows)


def test_owl_rdfxml_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.owl")
    n = write_owl_rdfxml(
        _triples(spark), path,
        ontology_iri="http://purl.obolibrary.org/obo/OMOP/ontology",
    )
    assert n == 2  # two owl:Class blocks

    root = ET.parse(path).getroot()  # strict parse = well-formed XML
    assert root.tag == f"{RDF}RDF"
    classes = {
        c.get(f"{RDF}about"): c for c in root.findall(f"{OWL}Class")
    }
    assert set(classes) == {f"{OMOP_BASE}1", f"{OMOP_BASE}2"}

    c1 = classes[f"{OMOP_BASE}1"]
    # escaped literal round-trips through a real XML parser
    assert c1.find(f"{RDFS}label").text == 'A & B <"tricky">'
    # direct subClassOf (Is a)
    parents = {
        sc.get(f"{RDF}resource")
        for sc in c1.findall(f"{RDFS}subClassOf")
        if sc.get(f"{RDF}resource")
    }
    assert f"{OMOP_BASE}2" in parents
    # omoprel edge → robot 'SC omoprel:Maps_to some OMOP:9' restriction
    restrictions = [
        sc.find(f"{OWL}Restriction")
        for sc in c1.findall(f"{RDFS}subClassOf")
        if sc.find(f"{OWL}Restriction") is not None
    ]
    assert len(restrictions) == 1
    r = restrictions[0]
    assert (
        r.find(f"{OWL}onProperty").get(f"{RDF}resource")
        == f"{OMOPREL_BASE}Maps_to"
    )
    assert (
        r.find(f"{OWL}someValuesFrom").get(f"{RDF}resource")
        == f"{OMOP_BASE}9"
    )
    # property declarations present with the right kinds
    ann = {a.get(f"{RDF}about") for a in root.findall(f"{OWL}AnnotationProperty")}
    obj = {o.get(f"{RDF}about") for o in root.findall(f"{OWL}ObjectProperty")}
    assert f"{OMOP_BASE}domain_id" in ann
    assert f"{OMOPREL_BASE}Maps_to" in obj
    # ontology header
    assert root.find(f"{OWL}Ontology").get(f"{RDF}about").endswith("/OMOP/ontology")


def test_owl_artifact_from_reference_fixture(spark, tmp_path):
    """End-to-end: fixture CSVs → pipeline → .owl; every concept becomes a
    class and the file stays parseable."""
    from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline

    concept = "/root/reference/test/input/CPT4/concept.csv"
    rel = concept.replace("concept.csv", "concept_relationship.csv")
    out = str(tmp_path / "o")
    report = run_pipeline(
        spark,
        PipelineConfig(
            source=concept, concept_relationship_path=rel, mode="omop",
            output_dir=out, relationships=["ALL"], canonicalize=False,
            resume=False,
        ),
    )
    triples = spark.read.parquet(report["output"])
    path = str(tmp_path / "OMOP.owl")
    n = write_owl_rdfxml(triples, path)
    assert n == triples.select("subj").distinct().count()
    root = ET.parse(path).getroot()
    assert len(root.findall(f"{OWL}Class")) == n


def test_mixed_use_predicate_declared_object_property(spark, tmp_path):
    """A predicate with both literal and IRI objects must be declared
    ObjectProperty (owl:onProperty references it), never annotation-only
    punning."""
    rows = [
        Row(subj="OMOP:1", pred="rdf:type", obj="owl:Class",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="omoprel:has_part", obj="free text",
            obj_is_literal=True, vocabulary_id="V", src_sha256=""),
        Row(subj="OMOP:1", pred="omoprel:has_part", obj="OMOP:2",
            obj_is_literal=False, vocabulary_id="V", src_sha256=""),
    ]
    path = str(tmp_path / "m.owl")
    write_owl_rdfxml(spark.createDataFrame(rows), path)
    root = ET.parse(path).getroot()
    obj = {o.get(f"{RDF}about") for o in root.findall(f"{OWL}ObjectProperty")}
    ann = {a.get(f"{RDF}about") for a in root.findall(f"{OWL}AnnotationProperty")}
    assert f"{OMOPREL_BASE}has_part" in obj
    assert f"{OMOPREL_BASE}has_part" not in ann
