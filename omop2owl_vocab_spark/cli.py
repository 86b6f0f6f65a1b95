"""CLI — mirrors the reference's surface (``cli_parser``,
``omop2owl_vocab.py:588-645``) mapped onto the Spark pipeline.

A user of the reference can switch with the same mental model:

  omop2owl-vocab -c concept.csv -r concept_relationship.csv -R ALL
    → python -m omop2owl_vocab_spark -c concept.csv -r concept_relationship.csv -R ALL

Differences (documented, deliberate):
- ``--output-type split/merged/merged-post-split`` collapse: partitioned
  output gives per-vocab files AND the merged view in one write, so the
  flag only controls nothing and is accepted for compatibility.
- ``--memory`` (robot heap) is meaningless — accepted, ignored.
- new: ``--source/--mode code`` for the grafted code_files input, and
  ``--master`` to pick local[N] without spark-submit.
"""

from __future__ import annotations

import argparse
import json
import sys

from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

PROG = "omop2owl-vocab-spark"
DESC = "Convert OMOP vocabularies (or code_files tables) to a partitioned triple table."


def cli_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=PROG, description=DESC)
    p.add_argument("-c", "--concept-csv-path", help="concept table (omop mode)")
    p.add_argument(
        "-r", "--concept-relationship-csv-path",
        help="concept_relationship table (omop mode)",
    )
    p.add_argument("-s", "--source", help="code_files Iceberg id / parquet path (code mode)")
    p.add_argument("-O", "--outdir", required=True, help="output directory")
    p.add_argument(
        "-o", "--output-type",
        choices=["merged", "split", "merged-post-split"],
        default="merged-post-split",
        help="accepted for reference compatibility; output is always a "
        "vocab-partitioned table (= merged + split views in one)",
    )
    p.add_argument("-v", "--vocabs", nargs="+", default=[], help="vocabulary scope (R8)")
    p.add_argument(
        "-R", "--relationships", nargs="+", default=["Is a"],
        help="relationship types to keep; 'ALL' for every type",
    )
    p.add_argument("--use-cache", action="store_true", help="resume from stage checkpoints")
    p.add_argument(
        "--exclude-singletons", action="store_true",
        help="drop concepts with no relationships (documented intent — the "
        "reference's implementation has inverted polarity, see SURVEY Q1)",
    )
    p.add_argument("--no-canonicalize", action="store_true", help="skip equivalence merge")
    p.add_argument(
        "--semsql", action="store_true",
        help="also write a SemanticSQL-shaped SQLite statements db "
        "(compat-scale outputs only; K3 parity sink)",
    )
    p.add_argument("--ontology-id", default="OMOP")
    p.add_argument(
        "--bucket-count", type=int, default=0,
        help="materialize s1 checkpoints as bucketed tables clustered on "
        "the join keys (shuffle-free emission join); 0 = off",
    )
    p.add_argument(
        "--compact-output", action="store_true",
        help="salted repartition before the final write for few, bounded "
        "files per vocabulary (adds one full-width shuffle)",
    )
    p.add_argument("--memory", type=int, default=0, help="ignored (no robot.jar here)")
    p.add_argument("--master", default=None, help="spark master override, e.g. local[8]")
    return p


def route_and_run(d: dict) -> dict:
    mode = "code" if d.get("source") else "omop"
    if mode == "omop" and not (
        d.get("concept_csv_path") and d.get("concept_relationship_csv_path")
    ):
        raise SystemExit("need -c/-r (omop mode) or -s (code mode)")
    cfg = PipelineConfig(
        source=d.get("source") or d["concept_csv_path"],
        concept_relationship_path=d.get("concept_relationship_csv_path"),
        mode=mode,
        output_dir=d["outdir"],
        ontology_id=d.get("ontology_id", "OMOP"),
        relationships=list(d.get("relationships") or ["Is a"]),
        vocabs=list(d.get("vocabs") or []),
        canonicalize=not d.get("no_canonicalize", False),
        exclude_singletons=d.get("exclude_singletons", False),
        resume=d.get("use_cache", False),
        bucket_count=d.get("bucket_count", 0),
        compact_output=d.get("compact_output", False),
    )
    spark = get_spark(master=d.get("master"))
    report = run_pipeline(spark, cfg)
    if d.get("semsql"):
        import os

        from omop2owl_vocab_spark.operators.semsql import write_semsql_sqlite

        db_path = os.path.join(
            d["outdir"], f"{cfg.ontology_id.replace(' ', '-')}.db"
        )
        write_semsql_sqlite(spark.read.parquet(report["output"]), db_path)
        report["semsql"] = db_path
    return report


def cli(argv: list[str] | None = None) -> None:
    d = vars(cli_parser().parse_args(argv))
    report = route_and_run(d)
    json.dump(report, sys.stdout, indent=1, sort_keys=True)
    print()
