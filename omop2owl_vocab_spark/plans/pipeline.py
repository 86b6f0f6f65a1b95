"""Pipeline orchestration — the engine's ``omop2owl()`` equivalent
(reference orchestrator at ``omop2owl_vocab.py:430-545``).

One lazy DAG per stage, checkpointed between stages:

    S1 derive   code_files → (concepts, raw_edges)          [code mode]
                or concept/concept_relationship CSVs        [omop compat mode]
    S2+S3 emit  R1-R6 triple emission                       → triples_raw
    S4 link     equivalence edges → connected components    → canon_map
    S5 canon    canonical rewrite + dedupe                  → triples
    S6 write    salted repartition → partitionBy(vocabulary_id)

Where the reference bounds memory by *sequential per-vocab subruns*
(``split_by_vocab``, omop2owl_vocab.py:462-540, "Use this option if running
out of memory"), we get the same isolation from partition parallelism, and
handle the SNOMED-analog skew (one giant ``lang``) by salting the final
repartition: files per output partition stay bounded regardless of vocab
size, and no text-stitching merge stage exists because ``union`` is a
logical-plan node.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.canon import canonicalize_triples
from omop2owl_vocab_spark.operators.emit import emit_triples
from omop2owl_vocab_spark.operators.link import canonical_map, connected_components
from omop2owl_vocab_spark.plans.checkpoint import CheckpointManager
from omop2owl_vocab_spark.plans.derive import derive_concepts, derive_edges
from omop2owl_vocab_spark.sources.code_files import read_code_files
from omop2owl_vocab_spark.sources.omop import (
    read_concept,
    read_concept_relationship,
)

ONTOLOGY_IRI_FMT = "http://purl.obolibrary.org/obo/{}/ontology"  # R9 (:445-446)


@dataclass
class PipelineConfig:
    source: str  # code_files location (code mode) or concept CSV path (omop mode)
    output_dir: str
    mode: str = "code"  # 'code' | 'omop'
    concept_relationship_path: str | None = None  # omop mode only
    ontology_id: str = "OMOP"
    relationships: list[str] = field(default_factory=lambda: ["ALL"])
    vocabs: list[str] = field(default_factory=list)  # R8 scoping; [] = all
    equivalence_rels: list[str] = field(default_factory=lambda: ["Maps to"])
    canonicalize: bool = True
    exclude_singletons: bool = False
    resume: bool = True
    # compact_output=True adds a salted repartition before the write so each
    # vocab lands in few, bounded files (skew-salted).  False (default)
    # writes straight out of the dedup aggregate's partitioning — one fewer
    # full-width shuffle; skew is already neutralized because the dedup
    # hash keys (subj, pred, obj) distribute uniformly, and partitionBy
    # splits files per vocab within each task.
    compact_output: bool = False
    # salting: vocabs whose triple count exceeds this get hash-salted into
    # this many sub-buckets at the compact-output repartition
    salt_threshold_rows: int = 5_000_000
    salt_buckets: int = 16
    max_records_per_file: int = 5_000_000
    # canonical map rows below this broadcast explicitly (the ckpt metrics
    # give the exact count for free); above it, AQE picks the strategy —
    # at 10^12-file scale a merge-heavy corpus can have a canon map too
    # big for any driver
    broadcast_canon_max_rows: int = 5_000_000
    # bucket_count > 0 materializes the s1 checkpoints as bucketed tables
    # hash-clustered on their join keys (concepts on concept_id, edges on
    # concept_id_1), making the emission membership join co-located —
    # zero shuffle on either side.  The local analog of Iceberg
    # storage-partitioned joins for the 10^12-row case where neither side
    # broadcasts.  0 = plain parquet directories.
    bucket_count: int = 0
    # reliable-checkpoint dir for the CC driver loop (HDFS/S3/shared fs) —
    # None = localCheckpoint (local-mode default; lossy under executor
    # loss on a real cluster, see operators/link.py)
    cc_checkpoint_dir: str | None = None

    def key(self) -> dict:
        d = asdict(self)
        d.pop("resume")
        d.pop("cc_checkpoint_dir")  # where lineage truncates ≠ what's computed
        # bump whenever OUTPUT SEMANTICS change without a config change, so
        # whole-run resume can't serve stale pre-upgrade triples (v2:
        # sha256 over coalesced content, vocab-scoped canonicalization)
        d["pipeline_version"] = 2
        return d

    # per-stage cache keys: each stage's checkpoint is invalidated only by
    # the config fields that feed it — re-layout knobs (compact_output,
    # salt_*, max_records_per_file) must NOT force upstream recomputes
    def key_s1(self) -> dict:
        return {
            "stage": "s1",
            # v2: concepts carry import_toks; edges derive from the
            # checkpoint (single content scan).  Bump invalidates v1
            # checkpoints that lack the column.
            "s1_version": 2,
            "source": self.source,
            "mode": self.mode,
            "concept_relationship_path": self.concept_relationship_path,
            "bucket_count": self.bucket_count,
        }

    def key_s3(self) -> dict:
        return self.key_s1() | {
            "stage": "s3",
            "relationships": self.relationships,
            "vocabs": self.vocabs,
            "exclude_singletons": self.exclude_singletons,
            "dedupe": not self.canonicalize,
        }

    def key_s4(self) -> dict:
        return self.key_s1() | {
            "stage": "s4",
            "equivalence_rels": self.equivalence_rels,
            # the equivalence graph is vocab-scoped (see run_pipeline) —
            # a different scope is a different canon map
            "vocabs": self.vocabs,
        }


def _load_inputs(
    spark: SparkSession, cfg: PipelineConfig, ckpt: CheckpointManager
) -> tuple[DataFrame, DataFrame]:
    if cfg.mode == "code":
        code = read_code_files(spark, cfg.source)
        # single content scan for the whole run: concepts carry the
        # per-file import tokens, and the edge stage derives everything
        # from this checkpoint (derive_edges_from_concepts) — the 100 TB
        # content column is never read a second time
        concepts, _ = ckpt.get_or_compute(
            spark, "s1_concepts",
            lambda: derive_concepts(code, with_import_toks=True),
            lineage_col="vocabulary_id", resume=cfg.resume,
            bucket_col="concept_id", bucket_count=cfg.bucket_count,
        )
        edges, _ = ckpt.get_or_compute(
            spark, "s1_edges", lambda: derive_edges(code, concepts=concepts),
            lineage_col="relationship_id", resume=cfg.resume,
            bucket_col="concept_id_1", bucket_count=cfg.bucket_count,
        )
    elif cfg.mode == "omop":
        if cfg.bucket_count:
            raise ValueError(
                "bucket_count applies to code mode only (omop mode reads "
                "CSVs directly with no checkpointed s1 stage to bucket)"
            )
        concepts = read_concept(spark, cfg.source)
        edges = read_concept_relationship(spark, cfg.concept_relationship_path)
    else:
        raise ValueError(f"unknown mode {cfg.mode!r}")

    if cfg.vocabs:  # R8 (omop2owl_vocab.py:396-401); F4 subsumed by R7 —
        # forward edges need c1∈concepts, reverse need both, which is
        # strictly tighter than the reference's either-endpoint keep.
        concepts = concepts.filter(F.col("vocabulary_id").isin(cfg.vocabs))
    return concepts, edges


def _salted_repartition(
    triples: DataFrame, cfg: PipelineConfig, counts: dict | None = None
) -> DataFrame:
    """Skew-aware final layout: vocabs above threshold spread over
    ``salt_buckets`` hash buckets; small vocabs land in one task each.

    ``counts`` (vocab → rows) is reused from the upstream stage's lineage
    metrics when available — no extra count job."""
    if counts is None:
        counts = {
            r[0]: r[1]
            for r in triples.groupBy("vocabulary_id").count().collect()
        }
    big = [v for v, n in counts.items() if n >= cfg.salt_threshold_rows]
    if big:
        salt = F.when(
            F.col("vocabulary_id").isin(big),
            F.pmod(F.xxhash64("subj"), F.lit(cfg.salt_buckets)),
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    n_parts = max(len(counts), 1) + len(big) * (cfg.salt_buckets - 1)
    return triples.repartition(n_parts, F.col("vocabulary_id"), salt)


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Execute S1→S6; returns a report dict (the reference returns a dict of
    output paths, omop2owl_vocab.py:476,545)."""
    from omop2owl_vocab_spark.plans.checkpoint import config_hash

    ckpt_root = os.path.join(cfg.output_dir, "ckpt")
    # per-stage managers so a re-layout rerun (compact_output, salting,
    # file-size knobs) reuses every upstream checkpoint
    ckpt_s1 = CheckpointManager(ckpt_root, cfg.key_s1())
    ckpt_s3 = CheckpointManager(ckpt_root, cfg.key_s3())
    ckpt_s4 = CheckpointManager(ckpt_root, cfg.key_s4())
    full_hash = config_hash(cfg.key())
    report: dict = {"config_hash": full_hash, "stages": {}}

    out_dir = os.path.join(cfg.output_dir, "triples")
    manifest_path = os.path.join(cfg.output_dir, "_manifest.json")

    # C1-equivalent whole-run memoization FIRST — a valid final artifact
    # must short-circuit before any upstream stage recomputes (the
    # reference skips the whole run when the .db exists,
    # omop2owl_vocab.py:453-455; checkpoints may have been cleaned away)
    if cfg.resume and os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        try:
            with open(manifest_path) as f:
                if json.load(f).get("config_hash") == full_hash:
                    report["stages"]["s6_write"] = {"cached": True}
                    report["output"] = out_dir
                    return report
        except (OSError, ValueError):
            # missing OR truncated manifest (non-atomic legacy writes /
            # kill mid-dump) → just recompute; never crash the resume path
            pass

    concepts, edges = _load_inputs(spark, cfg, ckpt_s1)

    # emission: skip the dedup shuffle here when canonicalization follows
    # (it dedupes after the rewrite; one full-width shuffle instead of two)
    def _run_s3():
        return ckpt_s3.get_or_compute(
            spark,
            "s3_triples_raw",
            lambda: emit_triples(
                concepts,
                edges,
                relationships=cfg.relationships,
                exclude_singletons=cfg.exclude_singletons,
                dedupe=not cfg.canonicalize,
            ),
            lineage_col="vocabulary_id",
            resume=cfg.resume,
        )

    if cfg.canonicalize:
        def _canon_map() -> DataFrame:
            eq = edges.filter(
                F.col("relationship_id").isin(cfg.equivalence_rels)
            ).select(
                F.col("concept_id_1").alias("src"),
                F.col("concept_id_2").alias("dst"),
            )
            if cfg.vocabs:
                # scope the equivalence graph to in-scope concepts on BOTH
                # endpoints: a cross-vocab 'Maps to' edge must not rewrite
                # an in-scope subject to a canonical id that has no
                # class/label triples in this output (and would silently
                # drop the in-scope id).  `concepts` is already
                # vocab-filtered by _load_inputs.
                ids = concepts.select(F.col("concept_id").alias("src"))
                eq = eq.join(ids, "src", "left_semi").join(
                    ids.withColumnRenamed("src", "dst"), "dst", "left_semi"
                )
            labels, stats = connected_components(
                eq, checkpoint_dir=cfg.cc_checkpoint_dir
            )
            report["stages"]["s4_link"] = stats
            return canonical_map(labels)

        # s3 (emission) and s4 (equivalence CC → canon map) are
        # INDEPENDENT given the s1 frames — overlap them from two driver
        # threads (guide §2.6): the FIFO scheduler gives s3's stages
        # resources first and s4's CC rounds back-fill the idle tail
        # (the CC driver loop is collect-bound, leaving most cores free).
        # Each stage keeps its own CheckpointManager/directory, so
        # resume/kill semantics are unchanged; job descriptions are
        # thread-local so the UI attribution stays correct.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=2) as pool:
            f3 = pool.submit(inheritable_thread_target(_run_s3))
            f4 = pool.submit(
                inheritable_thread_target(
                    lambda: ckpt_s4.get_or_compute(
                        spark, "s4_canon_map", _canon_map, resume=cfg.resume
                    )
                )
            )
            triples_raw, cached3 = f3.result()
            canon, cached = f4.result()
        report["stages"]["s3_triples_raw"] = {"cached": cached3}
        report["stages"]["s4_canon_map"] = {"cached": cached}
        # the canon map is materialized in its own checkpoint now — the
        # CC rounds' reliable checkpoint files (never auto-deleted by
        # Spark) are dead weight from here on
        # (local-fs deletion; object-store deployments should point
        # cc_checkpoint_dir at a lifecycle-ruled prefix instead)
        cc_subdir = report["stages"].get("s4_link", {}).get("checkpoint_subdir")
        if cc_subdir and os.path.isdir(cc_subdir):
            import shutil

            shutil.rmtree(cc_subdir, ignore_errors=True)
        try:
            canon_rows = ckpt_s4.metrics("s4_canon_map").get("rows", 0)
        except OSError:
            canon_rows = 0
        if canon_rows < cfg.broadcast_canon_max_rows:
            canon = F.broadcast(canon)
        # s5+s6 fused: canonical rewrite → dedup → salted write, one pass;
        # the partitioned output directory IS the s5 artifact (resume-wise
        # the _SUCCESS marker plays the checkpoint role)
        triples = canonicalize_triples(triples_raw, canon)
    else:
        triples_raw, cached3 = _run_s3()
        report["stages"]["s3_triples_raw"] = {"cached": cached3}
        triples = triples_raw

    if cfg.compact_output:
        # salt from the raw-stage lineage: canonicalization only shrinks
        # counts slightly, and salting needs magnitude, not exactness
        try:
            counts = ckpt_s3.metrics("s3_triples_raw").get("partition_lineage")
        except OSError:
            counts = None
        final = _salted_repartition(triples, cfg, counts=counts)
    else:
        final = triples
    (
        final.write.mode("overwrite")
        .option("maxRecordsPerFile", cfg.max_records_per_file)
        .partitionBy("vocabulary_id")
        .parquet(out_dir)
    )
    report["stages"]["s6_write"] = {"cached": False}

    # X4 (reference omop2owl_vocab.py:186,452,481): per-vocab artifact
    # names are space→dash normalized.  Partition values stay verbatim in
    # the table (data fidelity; Spark URL-escapes specials in dir names) —
    # the manifest records the reference-compatible artifact name each
    # vocab partition corresponds to.
    from urllib.parse import unquote

    from omop2owl_vocab_spark.api import merged_artifact_name

    per_vocab = {}
    for entry in sorted(os.listdir(out_dir)):
        if entry.startswith("vocabulary_id="):
            vocab = unquote(entry.split("=", 1)[1])
            per_vocab[vocab] = merged_artifact_name(
                f"{cfg.ontology_id}-{vocab}", [], "owl"
            )

    manifest = {
        "ontology_iri": ONTOLOGY_IRI_FMT.format(cfg.ontology_id),
        "config_hash": full_hash,
        "config": {k: str(v) for k, v in cfg.key().items()},
        "per_vocab_artifacts": per_vocab,
    }
    # atomic: a kill mid-dump must not leave a truncated manifest behind
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(manifest_path + ".tmp", manifest_path)

    report["output"] = out_dir
    return report
