"""winsorize (exact nearest-rank clipping) and postings_delta
(gap-encoded posting lists)."""

from omop2owl_vocab_spark.operators.stats import winsorize
from omop2owl_vocab_spark.operators.text import postings_delta


def test_winsorize_clips_to_group_fences(spark):
    # group g: values 1..20 -> p10 = ceil(10*20/100)=2nd value = 2,
    # p90 = ceil(90*20/100)=18th = 18
    rows = [("g", i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["v"]: r["clipped"]
        for r in winsorize(df, ["g"], "v", 10, 90).collect()
    }
    assert got[1] == 2 and got[2] == 2
    assert got[19] == 18 and got[20] == 18
    assert got[10] == 10  # interior untouched


def test_winsorize_null_passthrough(spark):
    rows = [("g", 1), ("g", 2), ("g", 3), ("g", None), ("h", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = winsorize(df, ["g"], "v", 34, 67).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["v"], r["clipped"]))
    assert (None, None) in by_group["g"]
    # group h has no non-null values: value passes through
    assert by_group["h"] == [(None, None)]


def test_postings_delta_gaps_and_cap(spark):
    rows = [
        (3, "zebra common"),
        (10, "common"),
        (27, "common zebra zebra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["gaps"], r["max_gap"])
        for r in postings_delta(df, min_df=2).collect()
    }
    # common in docs 3,10,27 -> gaps 3,7,17; zebra in 3,27 -> 3,24
    assert got == {
        "common": (3, "3,7,17", 17),
        "zebra": (2, "3,24", 24),
    }
    # cap truncates the list but not df
    capped = {
        r["term"]: (r["df"], r["gaps"])
        for r in postings_delta(df, min_df=2, max_postings=2).collect()
    }
    assert capped["common"] == (3, "3,7")


def test_postings_delta_single_doc_term(spark):
    df = spark.createDataFrame([(5, "unique")], "doc_id long, text string")
    r = postings_delta(df, min_df=1).collect()[0]
    assert (r["term"], r["df"], r["gaps"], r["max_gap"]) == (
        "unique", 1, "5", 5,
    )
