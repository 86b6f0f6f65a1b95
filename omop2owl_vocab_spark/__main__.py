"""``python -m omop2owl_vocab_spark`` — CLI shim (reference parity:
``omop2owl_vocab/__main__.py``)."""

from omop2owl_vocab_spark.cli import cli

if __name__ == "__main__":
    cli()
