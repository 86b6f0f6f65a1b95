import pytest

from omop2owl_vocab_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "omop2owl-vocab-spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.driver.memory": "4g",
        },
    )
    yield s
