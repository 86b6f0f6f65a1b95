"""Compat oracle: a faithful pandas transcription of the reference's
emission semantics, flattened to (subj, pred, obj) tuples per SURVEY §1.4.

Mirrors ``/root/reference/omop2owl_vocab/omop2owl_vocab.py``:
  - load + F1/F2 filters        :379-391
  - R8 vocab scoping            :396-401
  - rel-map build (R4-R7, X2)   :297-357  — INCLUDING the Q2 predicate
    clobber (``rel_maps[pred] = {}`` per relationship type) so the oracle
    is the reference, bugs and all; the fixtures never hit Q2.
  - template emission (R1-R3, F9, flattening of SC-some restrictions) :204-233

This is test-only code; the engine never imports it.
"""

from __future__ import annotations

import pandas as pd

REL_PRED_MAPPING = {"Is a": "rdfs:subClassOf"}
REL_PRED_REVERSE_MAPPING = {"RxNorm inverse is a": "rdfs:subClassOf"}
ANNOTATION_COLUMNS = [
    "domain_id",
    "vocabulary_id",
    "concept_class_id",
    "standard_concept",
    "concept_code",
    "valid_start_date",
    "valid_end_date",
    "invalid_reason",
]


def sanitize(rel: str) -> str:
    # literal transcription of the 30-rule chain (omop2owl_vocab.py:304-336)
    out = rel
    for ch in " \t\n,|;":
        out = out.replace(ch, "_")
    for ch in "/\\":
        out = out.replace(ch, ".")
    for ch in "~`!@#$%^*+=?'\"()[]{}<>":
        out = out.replace(ch, "-")
    return out


_CONCEPT_DTYPES = {
    c: str
    for c in ["concept_id", "concept_name"] + ANNOTATION_COLUMNS
}


def load_tables(concept_paths, rel_paths):
    # NB: dtype must be a dict — a scalar ``dtype=str`` is NOT applied to
    # the index column and concept_id silently becomes int64, breaking the
    # string-membership filter F6 (the reference passes CONCEPT_DTYPES,
    # omop2owl_vocab.py:384, so its index is str).
    concept_df = pd.concat(
        [
            pd.read_csv(p, index_col="concept_id", dtype=_CONCEPT_DTYPES).fillna("")
            for p in concept_paths
        ]
    )
    rel_df = pd.concat([pd.read_csv(p, dtype=str).fillna("") for p in rel_paths])
    rel_df = rel_df[rel_df.invalid_reason == ""]  # F2
    return concept_df, rel_df


def reference_triples(
    concept_df: pd.DataFrame,
    rel_df: pd.DataFrame,
    relationships=("ALL",),
    vocabs=None,
) -> set[tuple[str, str, str]]:
    relationships = list(relationships)
    if vocabs:  # R8 (:396-401)
        concept_df = concept_df[concept_df.vocabulary_id.isin(vocabs)]
        ids = set(concept_df.index)
        rel_df = rel_df[
            rel_df.concept_id_1.isin(ids) | rel_df.concept_id_2.isin(ids)
        ]
    concept_ids = set(concept_df.index)

    # _get_relationship_maps (:297-357)
    rel_df = rel_df.sort_values(["relationship_id"])
    rels = (
        relationships
        if relationships != ["ALL"]
        else list(rel_df.relationship_id.unique())
    )
    rel_maps: dict[str, dict[str, list[str]]] = {}
    for rel in rels:
        sanitized = sanitize(rel)
        reverse_rel = rel in REL_PRED_REVERSE_MAPPING
        if reverse_rel:
            pred = REL_PRED_REVERSE_MAPPING[rel]
        elif rel in REL_PRED_MAPPING:
            pred = REL_PRED_MAPPING[rel]
        else:
            pred = f"omoprel:{sanitized}"
        rel_maps[pred] = {}  # Q2 clobber, faithful (:344)
        df_i = rel_df[rel_df.relationship_id == rel]
        df_i = df_i[df_i.concept_id_1.isin(concept_ids)]  # F6 (:347)
        for row in df_i.itertuples(index=False):
            if reverse_rel:
                rel_maps[pred].setdefault(row.concept_id_2, []).append(row.concept_id_1)
            else:
                rel_maps[pred].setdefault(row.concept_id_1, []).append(row.concept_id_2)

    # template emission (:204-233), flattened
    triples: set[tuple[str, str, str]] = set()
    for row in concept_df.itertuples():
        curie = f"OMOP:{row.Index}"
        triples.add((curie, "rdf:type", "owl:Class"))  # R1
        if row.concept_name != "":  # R2 + F9
            triples.add((curie, "rdfs:label", row.concept_name))
        for attr in ANNOTATION_COLUMNS:  # R3 + F9
            val = getattr(row, attr)
            if val != "":
                triples.add((curie, f"OMOP:{attr}", val))
        for pred, adj in rel_maps.items():  # R4-R6
            for obj in adj.get(row.Index, []):
                triples.add((curie, pred, f"OMOP:{obj}"))
    return triples


def precision_recall(
    engine: set[tuple], oracle: set[tuple]
) -> tuple[float, float]:
    tp = len(engine & oracle)
    p = tp / len(engine) if engine else 1.0
    r = tp / len(oracle) if oracle else 1.0
    return p, r
