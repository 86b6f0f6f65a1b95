"""North-rule launch mode: the engine must run via
``spark-submit --py-files <zip>`` (BASELINE.json north_rule).  This test
executes the real packaging path — zip the package, spark-submit the
cluster entry point in a FRESH JVM/driver, assert artifacts."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(repo, "omop2owl_vocab_spark")
        for root, _, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))

    out = str(tmp_path / "out")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", pkg_zip,
            os.path.join(repo, "tools", "submit_job.py"),
            "-c", "/root/reference/test/input/CPT4/concept.csv",
            "-r", "/root/reference/test/input/CPT4/concept_relationship.csv",
            "-O", out, "-R", "ALL", "-S",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root — imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the report is the LAST JSON object on stdout — scan '{' offsets from
    # the right so unrelated brace-bearing log lines can't break parsing
    report = None
    for idx in (i for i in range(len(proc.stdout) - 1, -1, -1)
                if proc.stdout[i] == "{"):
        try:
            report = json.loads(proc.stdout[idx:])
            break
        except json.JSONDecodeError:
            continue
    assert report is not None, proc.stdout[-2000:]
    assert report["output"] == f"{out}/triples"
    assert report["owl_classes"] == 20
    assert os.path.exists(f"{out}/triples/_SUCCESS")
    assert os.path.exists(report["owl"])
