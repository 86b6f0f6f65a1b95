"""spark-submit entry point: same CLI surface as python -m
omop2owl_vocab_spark, shipped beside the --py-files zip."""

from omop2owl_vocab_spark.cli import cli

if __name__ == "__main__":
    cli()
