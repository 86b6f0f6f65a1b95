"""X2 sanitizer: byte-for-byte vs the reference's 30-rule replace chain."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from omop2owl_vocab_spark.functions.sanitize import (
    sanitize_predicate_col,
    sanitize_predicate_py,
)


def _reference_chain(s: str) -> str:
    # independent transcription of omop2owl_vocab.py:304-336
    return (
        s.replace(" ", "_").replace("\t", "_").replace("\n", "_")
        .replace(",", "_").replace("|", "_").replace(";", "_")
        .replace("/", ".").replace("\\", ".")
        .replace("~", "-").replace("`", "-").replace("!", "-").replace("@", "-")
        .replace("#", "-").replace("$", "-").replace("%", "-").replace("^", "-")
        .replace("*", "-").replace("+", "-").replace("=", "-").replace("?", "-")
        .replace("'", "-").replace('"', "-").replace("(", "-").replace(")", "-")
        .replace("[", "-").replace("]", "-").replace("{", "-").replace("}", "-")
        .replace("<", "-").replace(">", "-")
    )


CASES = [
    "SNOMED - ind/CI",          # reference-verified: SNOMED_-_ind.CI
    "CPT4 - SNOMED cat",        # reference-verified: CPT4_-_SNOMED_cat
    "Is a",
    "Maps to value",
    "Concept poss_eq from",
    "a,b|c;d",
    "w/x\\y",
    "odd ~`!@#$%^*+=?'\"()[]{}<> chars",
    "tab\tand\nnewline",
    "",
    "already_clean-name.x",
]


def test_python_twin_matches_reference_chain():
    for s in CASES:
        assert sanitize_predicate_py(s) == _reference_chain(s), s


def test_reference_verified_examples():
    assert sanitize_predicate_py("SNOMED - ind/CI") == "SNOMED_-_ind.CI"
    assert sanitize_predicate_py("CPT4 - SNOMED cat") == "CPT4_-_SNOMED_cat"


def test_spark_translate_matches(spark):
    df = spark.createDataFrame([Row(s=s) for s in CASES if s != ""])
    got = {
        r["s"]: r["out"]
        for r in df.select(
            "s", sanitize_predicate_col("s").alias("out")
        ).collect()
    }
    for s, out in got.items():
        assert out == _reference_chain(s), s
