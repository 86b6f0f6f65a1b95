"""Unit tests for the round-5 additions: keyed as-of join
(`operators/asof.py`), corpus-wide line dedup and TF-IDF top terms
(`operators/text.py`).  Semantics pinned on crafted micro-data where
every expected row is hand-derivable; the DuckDB hash-exact gate covers
the same operators at sf0.01 via `__spark_entry__.py`.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.asof import asof_join
from omop2owl_vocab_spark.operators.text import line_dedup, tfidf_top_terms


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows, cols=("k", "ts", "eid", "v")):
    return spark.createDataFrame(rows, list(cols))


# ------------------------------------------------------------- asof_join


def test_asof_basic_latest_prior_and_left_join(spark):
    left = _events(spark, [(1, _ts(10), 100, 0.0), (1, _ts(3), 101, 0.0),
                           (2, _ts(10), 102, 0.0)])
    right = _events(spark, [(1, _ts(5), 900, 1.5), (1, _ts(9), 901, 2.5),
                            (3, _ts(1), 902, 9.9)])
    out = {r["eid"]: r for r in asof_join(
        left, right, on="k", right_tiebreak="eid"
    ).collect()}
    assert out[100]["matched_eid"] == 901      # latest of the two priors
    assert out[100]["matched_v"] == 2.5
    assert out[101]["matched_eid"] is None     # nothing at or before ts=3
    assert out[102]["matched_eid"] is None     # key 2 has no right rows
    assert len(out) == 3                       # left join: every left row


def test_asof_inclusive_equal_ts_and_tiebreak(spark):
    left = _events(spark, [(1, _ts(5), 100, 0.0)])
    right = _events(spark, [(1, _ts(5), 900, 1.0), (1, _ts(5), 901, 2.0),
                            (1, _ts(4), 800, 3.0)])
    row = asof_join(left, right, on="k", right_tiebreak="eid").collect()[0]
    # a right row at exactly left.ts matches (>=), and among equal-ts
    # right rows the largest tiebreak wins
    assert row["matched_eid"] == 901
    assert row["matched_ts"] == _ts(5)


def test_asof_payload_comes_from_one_row(spark):
    # the matched row has v=None: per-column last(ignorenulls) would
    # reach PAST it to the older row's 7.0 — the struct transport must not
    left = _events(spark, [(1, _ts(10), 100, 0.0)])
    right = _events(spark, [(1, _ts(2), 900, 7.0), (1, _ts(9), 901, None)])
    row = asof_join(left, right, on="k", right_tiebreak="eid").collect()[0]
    assert row["matched_eid"] == 901
    assert row["matched_v"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _events(spark, [(1, _ts(10), 100, 0.0), (1, _ts(100), 101, 0.0)])
    right = _events(spark, [(1, _ts(8), 900, 1.0)])
    out = {r["eid"]: r for r in asof_join(
        left, right, on="k", right_tiebreak="eid",
        tolerance_us=5_000_000,
    ).collect()}
    assert out[100]["matched_eid"] == 900      # 2 s old: inside 5 s
    assert out[101]["matched_eid"] is None     # 92 s old: nulled
    assert out[101]["matched_ts"] is None


def test_asof_null_keys_never_match(spark):
    schema = "k bigint, ts timestamp, eid bigint, v double"
    left = spark.createDataFrame([(None, _ts(10), 100, 0.0)], schema)
    right = spark.createDataFrame([(None, _ts(5), 900, 1.0)], schema)
    row = asof_join(left, right, on="k", right_tiebreak="eid").collect()[0]
    assert row["matched_eid"] is None


def test_asof_plan_one_exchange_no_join(spark):
    left = _events(spark, [(1, _ts(10), 100, 0.0)])
    right = _events(spark, [(1, _ts(5), 900, 1.0)])
    plan = asof_join(
        left, right, on="k", right_tiebreak="eid"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union+window form, not a range join


# ------------------------------------------------------------ line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_removes_corpus_duplicates(spark):
    df = _docs(spark, [
        (1, "unique alpha\nSubscribe now!\nbody one"),
        (2, "unique beta\nSubscribe now!\nbody two"),
        (3, "unique gamma"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["text_dedup"] == "unique alpha\nbody one"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text_dedup"] == "unique beta\nbody two"
    assert out[3]["text_dedup"] == "unique gamma"
    assert out[3]["n_removed"] == 0


def test_line_dedup_normalizes_case_and_whitespace(spark):
    df = _docs(spark, [
        (1, "All Rights Reserved.\nkeep a"),
        (2, "  all rights reserved.  \nkeep b"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # the two variants normalize to the same key and both get removed
    assert out[1]["text_dedup"] == "keep a"
    assert out[2]["text_dedup"] == "keep b"


def test_line_dedup_blank_lines_kept_and_uncounted(spark):
    df = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n \nf")])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # blank lines appear 3x corpus-wide but are never dup-keyed
    assert out[1]["text_dedup"] == "a\n\nb"
    assert out[3]["text_dedup"] == "e\n \nf"
    assert all(r["n_removed"] == 0 for r in out.values())


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    df = _docs(spark, [
        (1, "dup x\ndup y"), (2, "dup x\ndup y"), (3, "solo")
    ])
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert len(out) == 3                       # every doc present
    assert out[1]["text_dedup"] == ""
    assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 2


def test_line_dedup_min_count_boundary(spark):
    df = _docs(spark, [(1, "pair"), (2, "pair"), (3, "pair")])
    kept2 = {r["doc_id"]: r for r in line_dedup(df, min_count=4).collect()}
    assert all(r["text_dedup"] == "pair" for r in kept2.values())
    gone = {r["doc_id"]: r for r in line_dedup(df, min_count=3).collect()}
    assert all(r["text_dedup"] == "" for r in gone.values())
    with pytest.raises(ValueError):
        line_dedup(df, min_count=1)


# ------------------------------------------------------- tfidf_top_terms


def test_tfidf_ratio_mode_exact(spark):
    df = _docs(spark, [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ])
    out = {(r["doc_id"], r["term"]): r for r in
           tfidf_top_terms(df, k=2, idf_mode="ratio").collect()}
    # doc 1: apple tf=2 df=1 → 2*4/2=4.0 ; banana tf=1 df=2 → 4/3
    r = out[(1, "apple")]
    assert (r["tf"], r["df"], r["rank"]) == (2, 1, 1)
    assert r["score_e4"] == 40000
    assert out[(1, "banana")]["score_e4"] == 13333  # 4/3 → 1.3333…
    # doc 3: cherry tf=3 df=2 → 12/3=4.0 ranks above durian 4/2=2.0
    assert out[(3, "cherry")]["rank"] == 1
    assert out[(3, "durian")]["score_e4"] == 20000
    # k=2 honored
    assert all(r["rank"] <= 2 for r in out.values())


def test_tfidf_log_mode_scores_and_ranks(spark):
    df = _docs(spark, [
        (1, "x x y"), (2, "y z"), (3, "z z"),
    ])
    rows = tfidf_top_terms(df, k=3, idf_mode="log").collect()
    got = {(r["doc_id"], r["term"]): r for r in rows}
    # x: tf=2 df=1 → 2·ln(3); y in doc1: tf=1 df=2 → ln(1.5)
    assert got[(1, "x")]["score_e4"] == pytest.approx(
        math.floor(2 * math.log(3.0) * 10000 + 0.5)
    )
    assert got[(1, "x")]["rank"] == 1
    assert got[(2, "y")]["df"] == 2 and got[(2, "z")]["df"] == 2


def test_tfidf_tie_breaks_by_term(spark):
    df = _docs(spark, [(1, "bb aa"), (2, "cc")])
    rows = tfidf_top_terms(df, k=2, idf_mode="ratio").collect()
    doc1 = sorted(
        [(r["rank"], r["term"]) for r in rows if r["doc_id"] == 1]
    )
    # aa and bb have identical (tf, df) → identical score → term asc
    assert doc1 == [(1, "aa"), (2, "bb")]


def test_tfidf_single_token_path_no_self_join(spark):
    df = _docs(spark, [(1, "a b"), (2, "b c")])
    out = tfidf_top_terms(df, k=1, idf_mode="ratio")
    out.collect()  # finalize the AQE plan before inspecting it
    plan = out._jdf.queryExecution().executedPlan().toString()
    # document frequency is a window over the (doc, term) counts, NOT a
    # tf ⋈ tf.groupBy(term) self-join (which double-scans the corpus:
    # ReuseExchange does not fire across those branches)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the AQE string repeats the plan under '== Initial Plan =='; pin the
    # executed section only
    final = plan.split("== Initial Plan ==")[0]
    # exactly the three linear token-path exchanges — (doc, term), term,
    # doc — plus the corpus-count branch's distinct-doc_id exchange (its
    # 1-row result arrives via IdentityBroadcastMode, not a shuffle join)
    assert final.count("Exchange hashpartitioning") == 4
    assert final.count("Generate explode") == 1
    assert final.count("IdentityBroadcastMode") == 1

    with pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)
    with pytest.raises(ValueError):
        tfidf_top_terms(df, idf_mode="bm25")
