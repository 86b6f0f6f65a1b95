"""url_dedup: canonical-URL normalization rules and dedup counts."""

from omop2owl_vocab_spark.operators.text import url_dedup


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["url"]: (r["n_urls"], r["n_docs"], r["first_doc"])
        for r in url_dedup(df).collect()
    }


def test_variants_collapse_to_one_canonical(spark):
    # host case, default port, trailing slash, fragment, tracking
    # params, and param order all normalize away
    rows = [
        (1, "see https://EX.Example.COM:443/path/?utm_source=x&b=2&a=1#f"),
        (2, "ref https://ex.example.com/path?a=1&b=2"),
        (3, "also http://Other.ORG:80/x"),
    ]
    got = _run(spark, rows)
    assert got == {
        "https://ex.example.com/path?a=1&b=2": (2, 2, 1),
        "http://other.org/x": (1, 1, 3),
    }


def test_non_default_port_and_value_case_kept(spark):
    rows = [
        (1, "a http://h.com:8080/P?Q=Va"),
        (2, "b http://h.com/P?Q=Va"),
    ]
    got = _run(spark, rows)
    assert got == {
        "http://h.com:8080/P?Q=Va": (1, 1, 1),
        "http://h.com/P?Q=Va": (1, 1, 2),
    }


def test_tracking_only_query_drops_entirely(spark):
    rows = [(5, "x https://a.io/p?utm_campaign=z&fbclid=1 y https://a.io/p")]
    got = _run(spark, rows)
    assert got == {"https://a.io/p": (2, 1, 5)}


def test_occurrences_vs_distinct_docs(spark):
    rows = [
        (1, "https://d.net/a https://d.net/a"),
        (2, "https://d.net/a"),
    ]
    got = _run(spark, rows)
    assert got == {"https://d.net/a": (3, 2, 1)}
