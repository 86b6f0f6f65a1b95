from omop2owl_vocab_spark.plans.derive import derive_concepts, derive_edges
from omop2owl_vocab_spark.plans.checkpoint import CheckpointManager
from omop2owl_vocab_spark.plans.pipeline import PipelineConfig, run_pipeline

__all__ = [
    "derive_concepts",
    "derive_edges",
    "CheckpointManager",
    "PipelineConfig",
    "run_pipeline",
]
