"""Streaming surface.

The reference is a pure batch converter — no streaming operators exist
(SURVEY §2.10): a single CLI run reads two CSVs and writes files.  "Resume
mid-pipeline" in the north rule is batch checkpointing (plans/checkpoint.py),
not Structured Streaming.

This package still provides an *incremental ingest* adapter for the grafted
source — new code_files landing in a directory are emitted as triples
continuously — because a 100 TB corpus is typically appended to, not
rewritten.  It reuses the exact batch emission operators (same plan,
``readStream`` source): triple emission is stateless per row, so no
watermark or state store is needed.
"""

from omop2owl_vocab_spark.streaming.dedup_stream import dedup_stream
from omop2owl_vocab_spark.streaming.ingest import stream_code_files_to_triples
from omop2owl_vocab_spark.streaming.window_agg import (
    windowed_counts,
    windowed_counts_stream,
)

__all__ = [
    "dedup_stream",
    "stream_code_files_to_triples",
    "windowed_counts",
    "windowed_counts_stream",
]
