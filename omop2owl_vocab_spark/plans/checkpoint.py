"""S6/C1-C3 — checkpoint/resume manager with per-partition lineage metrics.

Spark-native replacement for the reference's md5-keyed pickle cache
(``omop2owl_vocab.py:366-376,423-425``) and artifact-existence memoization
(``:453-455,201,239,269``): each stage writes a parquet directory named by
the stage and a config hash; a ``_metrics.json`` records row counts,
per-partition (vocabulary) lineage, and wall time.  Resume = skip stages
whose checkpoint validates (``_SUCCESS`` + matching config hash).

Atomicity: parquet's ``_SUCCESS`` marker plays the role of the reference's
delete-partials-on-exception hygiene (C5) — a failed write leaves no
marker, so the stage re-runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_hash(config: dict) -> str:
    payload = json.dumps(config, sort_keys=True, default=str)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()[:16]


class CheckpointManager:
    def __init__(self, root: str, config: dict):
        self.root = root
        self.hash = config_hash(config)
        os.makedirs(root, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}-{self.hash}")

    def _metrics_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "_metrics.json")

    def has(self, stage: str) -> bool:
        d = self.stage_dir(stage)
        return os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
            self._metrics_path(stage)
        )

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.stage_dir(stage))

    def metrics(self, stage: str) -> dict:
        with open(self._metrics_path(stage)) as f:
            return json.load(f)

    def write(
        self,
        stage: str,
        df: DataFrame,
        lineage_col: str | None = None,
        extra: dict | None = None,
    ) -> DataFrame:
        """Materialize a stage and return the re-read frame (truncates
        lineage like the reference's pickle round-trip, but distributed).

        ``lineage_col``: low-cardinality column (vocabulary_id / lang /
        relationship type) whose per-value row counts are the stage's
        per-partition lineage record.
        """
        t0 = time.monotonic()
        d = self.stage_dir(stage)
        df.write.mode("overwrite").parquet(d)
        wall = time.monotonic() - t0
        spark = df.sparkSession
        out = spark.read.parquet(d)
        m: dict = {
            "stage": stage,
            "config_hash": self.hash,
            "wall_sec": round(wall, 3),
        }
        # one job for rows + lineage (the groupBy sums to the row count)
        if lineage_col and lineage_col in out.columns:
            counts = (
                out.groupBy(lineage_col).agg(F.count("*").alias("n")).collect()
            )
            m["partition_lineage"] = {r[0] or "": r[1] for r in counts}
            m["rows"] = sum(r[1] for r in counts)
        else:
            m["rows"] = out.count()
        if extra:
            m.update(extra)
        with open(self._metrics_path(stage), "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        return out

    def get_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        compute,
        lineage_col: str | None = None,
        resume: bool = True,
    ) -> tuple[DataFrame, bool]:
        """(frame, was_cached). ``compute`` is a thunk returning a DataFrame."""
        if resume and self.has(stage):
            return self.read(spark, stage), True
        return self.write(stage, compute(), lineage_col=lineage_col), False
