"""Output layout (salting / maxRecordsPerFile) and failure-recovery checks."""

import glob
import os

from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.sources.synth import synth_code_files


def test_compact_output_salting(spark, tmp_path):
    src = str(tmp_path / "cf")
    out = str(tmp_path / "out")
    synth_code_files(spark, 2000).write.parquet(src)
    cfg = PipelineConfig(
        source=src,
        output_dir=out,
        compact_output=True,
        salt_threshold_rows=1000,   # python vocab (~55%) exceeds this
        salt_buckets=4,
    )
    run_pipeline(spark, cfg)
    py_files = glob.glob(f"{out}/triples/vocabulary_id=python/*.parquet")
    small = glob.glob(f"{out}/triples/vocabulary_id=c/*.parquet")
    # salted vocab spread over multiple files; small vocab stays compact
    assert len(py_files) > 1
    assert len(small) <= 2
    n = spark.read.parquet(f"{out}/triples").count()
    assert n > 0


def test_interrupted_final_write_recovers(spark, tmp_path):
    src = str(tmp_path / "cf")
    out = str(tmp_path / "out")
    synth_code_files(spark, 500).write.parquet(src)
    cfg = PipelineConfig(source=src, output_dir=out)
    run_pipeline(spark, cfg)
    n1 = spark.read.parquet(f"{out}/triples").count()

    # simulate a crash mid-write: _SUCCESS missing → rerun must rewrite
    os.remove(f"{out}/triples/_SUCCESS")
    report = run_pipeline(spark, cfg)
    assert report["stages"]["s6_write"] == {"cached": False}
    # earlier stages still resume from their checkpoints
    assert report["stages"]["s3_triples_raw"] == {"cached": True}
    assert spark.read.parquet(f"{out}/triples").count() == n1

    # intact output + matching manifest → whole-run memo hit
    report2 = run_pipeline(spark, cfg)
    assert report2["stages"]["s6_write"] == {"cached": True}


def test_iceberg_probe_graceful(spark):
    from omop2owl_vocab_spark.sources.code_files import iceberg_available

    assert iceberg_available(spark) in (True, False)  # no raise either way


def test_relayout_reuses_upstream_checkpoints(spark, tmp_path):
    """Layout-only knobs must not invalidate upstream stages (per-stage
    cache keys): rerunning with compact_output=True reuses s1/s3/s4."""
    src = str(tmp_path / "cf")
    out = str(tmp_path / "out")
    synth_code_files(spark, 500).write.parquet(src)
    run_pipeline(spark, PipelineConfig(source=src, output_dir=out))
    report = run_pipeline(
        spark,
        PipelineConfig(source=src, output_dir=out, compact_output=True,
                       salt_threshold_rows=100, salt_buckets=2),
    )
    assert report["stages"]["s3_triples_raw"] == {"cached": True}
    assert report["stages"]["s4_canon_map"] == {"cached": True}
    assert report["stages"]["s6_write"] == {"cached": False}
