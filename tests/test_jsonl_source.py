"""JSONL documents source: explicit-schema read, roundtrip vs the
parquet twin, and malformed-line quarantine."""

from omop2owl_vocab_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(pq, out, partitions=3)
    docs, quarantine = read_documents_jsonl(spark, out)
    assert quarantine.count() == 0
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df.select(sorted(df.columns)).collect())
    )
    assert key(docs) == key(pq)


def test_jsonl_quarantine_keeps_bad_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",'
        ' "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        "null\n"
        '{"broken": \n'
    )
    docs, quarantine = read_documents_jsonl(spark, str(p))
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == {1: "ok", 2: "also ok"}
    # the NULL-struct parses (literal `null`) are quarantined, never
    # phantom all-null document rows
    bad = sorted(r["line"] for r in quarantine.collect())
    assert bad == ["null", "this is not json", '{"broken": ']
    # parsed-but-sparse rows keep NULLs rather than being quarantined
    sparse = docs.filter("doc_id = 2").collect()[0]
    assert sparse["lang"] is None and sparse["n_chars"] is None
