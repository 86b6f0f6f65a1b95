"""trigram_lm (conditional next-token counts, exact e4 probabilities)
and reciprocity (directed-edge mutuality) semantics."""

from omop2owl_vocab_spark.operators.graph import reciprocity
from omop2owl_vocab_spark.operators.text import trigram_lm


def test_trigram_lm_counts_and_probs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c"),
            (3, "a b d"),
            (4, "x y"),  # too short for a trigram
        ],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"], r["w3"]): (r["n"], r["prob_e4"])
        for r in trigram_lm(docs).collect()
    }
    # context (a, b): c twice, d once -> 6666 / 3333
    assert got == {("a", "b", "c"): (2, 6666), ("a", "b", "d"): (1, 3333)}


def test_trigram_lm_case_folds_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "The cat sat"), (2, "the cat sat"), (3, "the cat ran")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"], r["w3"]): r["n"]
        for r in trigram_lm(docs, min_count=2).collect()
    }
    assert out == {("the", "cat", "sat"): 2}


def test_trigram_lm_within_doc_only(spark):
    # trigrams never span document boundaries
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    assert trigram_lm(docs).count() == 0


def test_reciprocity_counts(spark):
    # 1->2 and 2->1 reciprocal; 1->3 one-way; self-loop 4->4 ignored;
    # duplicate 1->2 collapses
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)], "src long, dst long"
    )
    r = reciprocity(edges).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"], r["reciprocity_e4"]) == (
        3,
        2,
        6666,
    )


def test_reciprocity_empty_after_filters(spark):
    edges = spark.createDataFrame([(1, 1)], "src long, dst long")
    r = reciprocity(edges).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"], r["reciprocity_e4"]) == (0, 0, 0)
