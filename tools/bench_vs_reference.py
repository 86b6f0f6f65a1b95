"""Head-to-head single-node throughput: this engine vs the reference's own
pandas implementation, on identical OMOP-shaped inputs.

The reference's robot.jar/semsql subprocess stages cannot run in this
sandbox (missing blob), so the comparison covers the compute both systems
share: load → filter → relationship-map build → axiom/triple emission.
Excluding robot/semsql only FAVORS the reference — in real runs those add
java+docker time on top.  The reference side executes the actual reference
code (read-only import); the template dict-build loop is timed as its
emission stage (that is what robot consumes).

Usage: python tools/bench_vs_reference.py [n_concepts] [rels_per_concept]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

ANNOS = [
    "domain_id", "vocabulary_id", "concept_class_id", "standard_concept",
    "concept_code", "valid_start_date", "valid_end_date", "invalid_reason",
]
RELS = ["Is a", "Maps to", "Has finding site", "Subsumes", "SNOMED - ind/CI"]
VOCABS = ["SNOMED", "SNOMED", "SNOMED", "RxNorm", "ICD10CM", "CPT4"]  # skewed


def synth_omop(n_concepts: int, rels_per: int, outdir: str) -> tuple[str, str]:
    ids = [str(10_000 + i) for i in range(n_concepts)]
    concept = pd.DataFrame(
        {
            "concept_id": ids,
            "concept_name": [f"Concept {i}" for i in range(n_concepts)],
            "domain_id": "Condition",
            "vocabulary_id": [VOCABS[i % len(VOCABS)] for i in range(n_concepts)],
            "concept_class_id": "Clinical Finding",
            "standard_concept": "S",
            "concept_code": [f"C{i}" for i in range(n_concepts)],
            "valid_start_date": "2020-01-01",
            "valid_end_date": "2099-12-31",
            "invalid_reason": "",
        }
    )
    rows = []
    for i in range(n_concepts):
        for j in range(rels_per):
            rows.append(
                (
                    ids[i],
                    ids[(i * 7 + j * 13 + 1) % n_concepts],
                    RELS[(i + j) % len(RELS)],
                    "1970-01-01",
                    "2099-12-31",
                    "",
                )
            )
    rel = pd.DataFrame(
        rows,
        columns=[
            "concept_id_1", "concept_id_2", "relationship_id",
            "valid_start_date", "valid_end_date", "invalid_reason",
        ],
    )
    cpath = os.path.join(outdir, "concept.csv")
    rpath = os.path.join(outdir, "concept_relationship.csv")
    concept.to_csv(cpath, index=False)
    rel.to_csv(rpath, index=False)
    return cpath, rpath


def run_reference(cpath: str, rpath: str) -> dict:
    """Execute the reference's own code path (omop2owl_vocab.py:360-426 +
    the template build loop :204-233, minus file/robot I/O)."""
    from omop2owl_vocab.omop2owl_vocab import (
        CONCEPT_DTYPES,
        CONCEPT_RELATIONSHIP_DTYPES,
        _get_relationship_maps,
    )

    t0 = time.monotonic()
    concept_df = pd.read_csv(
        cpath, index_col="concept_id", dtype=CONCEPT_DTYPES, sep=None,
        engine="python",
    ).fillna("")
    concept_ids = set(concept_df.index)
    rel_df = pd.read_csv(
        rpath, dtype=CONCEPT_RELATIONSHIP_DTYPES, sep=None, engine="python"
    ).fillna("")
    rel_df = rel_df[rel_df.invalid_reason == ""]
    t_load = time.monotonic() - t0

    t0 = time.monotonic()
    rel_maps = _get_relationship_maps(rel_df, ["ALL"], concept_ids)
    t_maps = time.monotonic() - t0

    # template build (the reference's emission; transcribed minimal loop)
    t0 = time.monotonic()
    n_axioms = 0
    d = {}
    for row in concept_df.itertuples():
        curie = f"OMOP:{row.Index}"
        row_dict = {"ID": curie, "Label": row.concept_name, "Type": "class"}
        n_axioms += 2
        for a in ANNOS:
            v = getattr(row, a)
            row_dict[a] = v
            if v != "":
                n_axioms += 1
        for pred, rel_map_i in rel_maps.items():
            try:
                objs = rel_map_i[row.Index]
                row_dict[pred] = "|".join(f"OMOP:{x}" for x in objs)
                n_axioms += len(objs)
            except (KeyError, IndexError):
                row_dict[pred] = ""
        d[curie] = row_dict
    t_emit = time.monotonic() - t0
    total = t_load + t_maps + t_emit
    return {
        "load_sec": round(t_load, 2),
        "rel_maps_sec": round(t_maps, 2),
        "emit_sec": round(t_emit, 2),
        "total_sec": round(total, 2),
        "axioms": n_axioms,
        "axioms_per_sec": round(n_axioms / total, 1),
    }


def run_engine(cpath: str, rpath: str, cpus: int = 32) -> dict:
    from omop2owl_vocab_spark.operators.emit import emit_triples
    from omop2owl_vocab_spark.session import get_spark
    from omop2owl_vocab_spark.sources.omop import (
        read_concept,
        read_concept_relationship,
    )

    spark = get_spark(
        "vs-ref", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    read_concept(spark, cpath).limit(10).count()
    t0 = time.monotonic()
    triples = emit_triples(
        read_concept(spark, cpath),
        read_concept_relationship(spark, rpath),
        relationships=["ALL"],
    )
    n = triples.count()
    total = time.monotonic() - t0
    return {
        "total_sec": round(total, 2),
        "triples": n,
        "triples_per_sec": round(n / total, 1),
    }


def main() -> None:
    import shutil

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rels_per = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="vsref_", dir=work_root)
    try:
        cpath, rpath = synth_omop(n, rels_per, work)
        ref = run_reference(cpath, rpath)
        eng = run_engine(cpath, rpath)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_concepts": n,
                "n_rel_rows": n * rels_per,
                "reference_pandas": ref,
                "this_engine": eng,
                "speedup_total": round(
                    ref["total_sec"] / eng["total_sec"], 2
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
