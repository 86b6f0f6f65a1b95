"""centroids (exact fixed-point group means) and sentence_stats
(lookbehind-free segmentation stats)."""

from omop2owl_vocab_spark.operators.similarity import centroids
from omop2owl_vocab_spark.operators.text import sentence_stats


def test_centroids_exact_values(spark):
    rows = [
        (1, [0.5, -0.25]),
        (1, [0.5, 0.75]),
        (2, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label long, embedding array<float>")
    got = {
        (r["label"], r["dim"]): (r["n"], r["sum_e6"], r["mean_e6"])
        for r in centroids(df).collect()
    }
    assert got == {
        (1, 0): (2, 1000000, 500000),
        (1, 1): (2, 500000, 250000),
        (2, 0): (1, 1000000, 1000000),
        (2, 1): (1, 0, 0),
    }


def test_centroids_negative_mean_rounds_half_up(spark):
    # sum_e6 = -1, n = 2 -> floor(-0.5 + 0.5) = 0 (portable double
    # floor, not engine-divergent integer div)
    rows = [(1, [-0.000001]), (1, [0.0])]
    df = spark.createDataFrame(rows, "label long, embedding array<float>")
    r = centroids(df).collect()[0]
    assert (r["sum_e6"], r["mean_e6"]) == (-1, 0)


def test_sentence_stats_counts(spark):
    rows = [
        (1, "one two three. four five! six?? seven  eight."),
        (2, "no terminal punctuation here"),
        (3, "...!!!"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_sentences"], r["sum_words"], r["max_words"],
            r["avg_words_e2"],
        )
        for r in sentence_stats(df).collect()
    }
    # doc 1: sentences of 3, 2, 1, 2 words -> n=4 sum=8 max=3 avg=200
    assert got[1] == (4, 8, 3, 200)
    assert got[2] == (1, 4, 4, 400)
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (0, 0, 0, 0)
