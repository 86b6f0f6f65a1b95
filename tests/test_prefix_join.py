"""prefix_filter_pairs == jaccard_pairs (the prefix filter is a pure
candidate pruning — recall 1.0 by the prefix lemma) plus a pruning-power
check that the prefix index is strictly smaller than the full one."""

from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_pairs,
    word_shingles,
)


def _corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",  # near-dup of 0
        "pack my box with five dozen liquor jugs",
        "pack my box with five dozen liquor mugs today",  # near-dup of 2
        "sphinx of black quartz judge my vow",
        "completely different text about spark shuffles and joins",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "one two",  # below shingle min for n=3, fine for n=2
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_matches_bruteforce(spark):
    for thr in (0.3, 0.5, 0.8):
        sh = word_shingles(_corpus(spark), n=2)
        got = sorted(
            tuple(r) for r in prefix_filter_pairs(sh, thr).collect()
        )
        want = sorted(tuple(r) for r in jaccard_pairs(sh, thr).collect())
        assert got == want, f"threshold {thr}"
        assert want, f"degenerate test at {thr} — no pairs"


def test_prefix_filter_finds_exact_dup(spark):
    sh = word_shingles(_corpus(spark), n=2)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_e4"]
        for r in prefix_filter_pairs(sh, 0.9).collect()
    }
    assert pairs[(0, 6)] == 10000


def test_prefix_index_is_smaller(spark):
    """At t=0.8 the prefix keeps |d| - ceil(0.8|d|) + 1 ≈ 0.2|d| rows —
    the pruning that makes the self-join affordable at scale."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(20)))
         for i in range(30)],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, n=2)
    full = sh.count()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__freq"))
    # replicate the operator's prefix selection to measure it
    from pyspark.sql import Window

    sized = sh.join(freq, "shingle")
    w = Window.partitionBy("id").orderBy("__freq", "shingle")
    szw = Window.partitionBy("id")
    ranked = sized.select(
        "id",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(szw).alias("sz"),
    )
    kept = ranked.filter(
        F.col("rnk") <= F.col("sz") - F.ceil(F.col("sz") * 0.8) + 1
    ).count()
    assert kept < full * 0.4
    assert kept > 0
