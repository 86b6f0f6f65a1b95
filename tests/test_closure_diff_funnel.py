"""Unit tests: ancestor_closure (path doubling, min/max levels, cycle
detection), keyed_diff (all four statuses, NULL payloads), group_histogram
(clamping, exact edges), funnel_steps (greedy-complete chains)."""

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.closure import ancestor_closure
from omop2owl_vocab_spark.operators.diff import keyed_diff
from omop2owl_vocab_spark.operators.funnel import funnel_steps
from omop2owl_vocab_spark.operators.stats import group_histogram


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "child long, parent long")


def _closure_dict(df):
    return {
        (r["ancestor"], r["descendant"]): (r["min_levels"], r["max_levels"])
        for r in df.collect()
    }


def _py_closure(pairs):
    """Brute-force oracle: DFS-enumerate all path lengths (small DAGs)."""
    from collections import defaultdict

    up = defaultdict(list)
    for c, p in pairs:
        up[c].append(p)
    out = {}

    def walk(start, node, depth):
        for p in up[node]:
            key = (p, start)
            lo, hi = out.get(key, (depth + 1, depth + 1))
            out[key] = (min(lo, depth + 1), max(hi, depth + 1))
            walk(start, p, depth + 1)

    for c in list(up):
        walk(c, c, 0)
    return out


def test_closure_chain_and_diamond(spark):
    # chain 4->3->2->1 plus shortcut 4->2: min(4,1)=2 via shortcut+edge,
    # max(1,4)=3 via the full chain
    pairs = [(4, 3), (3, 2), (2, 1), (4, 2)]
    closure, stats = ancestor_closure(_edges(spark, pairs))
    got = _closure_dict(closure)
    assert got == _py_closure(pairs)
    assert got[(1, 4)] == (2, 3)
    assert stats["converged"]


def test_closure_deep_chain_log_rounds(spark):
    # 17-node path: depth 16 must close in ceil(log2(16))+1 = 5 rounds
    pairs = [(i, i - 1) for i in range(1, 17)]
    closure, stats = ancestor_closure(_edges(spark, pairs), max_iter=6)
    got = _closure_dict(closure)
    assert got[(0, 16)] == (16, 16)
    assert len(got) == 17 * 16 // 2
    assert stats["rounds"] <= 5


def test_closure_cycle_raises(spark):
    with pytest.raises(RuntimeError, match="CYCLE|fixpoint"):
        ancestor_closure(_edges(spark, [(1, 2), (2, 3), (3, 1)]), max_iter=4)


def test_closure_include_self(spark):
    closure, _ = ancestor_closure(
        _edges(spark, [(2, 1)]), include_self=True
    )
    got = _closure_dict(closure)
    assert got == {(1, 2): (1, 1), (1, 1): (0, 0), (2, 2): (0, 0)}


def test_keyed_diff_statuses_and_nulls(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, None, 40)],
        "k long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (4, None, 40), (5, "e", 50)],
        "k long, s string, v int",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in keyed_diff(new, old, ["k"]).collect()
    }
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "v"),  # NULL -> 20 is a change (null-safe eq)
        3: ("removed", ""),
        4: ("unchanged", ""),  # NULL == NULL payload is unchanged
        5: ("added", ""),
    }


def test_keyed_diff_multi_column_names(spark):
    old = spark.createDataFrame([(1, "a", 1)], "k long, s string, v int")
    new = spark.createDataFrame([(1, "b", 2)], "k long, s string, v int")
    row = keyed_diff(new, old, ["k"], ["s", "v"]).collect()[0]
    assert (row["status"], row["changed_cols"]) == ("changed", "s,v")


def test_histogram_clamps_and_edges(spark):
    df = spark.createDataFrame(
        [("x", -5), ("x", 0), ("x", 199), ("x", 200), ("x", 999), ("x", 5000)],
        "g string, v long",
    )
    got = {
        r["bin_lo"]: r["n"]
        for r in group_histogram(df, ["g"], "v", 200, lo=0, hi=1000).collect()
    }
    # -5 and 0 and 199 clamp/fall into bin 0; 200 into bin 200;
    # 999 into bin 800; 5000 clamps into the last bin (800)
    assert got == {0: 3, 200: 1, 800: 2}


def test_funnel_greedy_complete_and_abandonment(spark):
    rows = [
        # u1 completes: signup@1, click@2, purchase@3
        ("u1", "signup", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        # u2 abandons after click; purchase BEFORE click must not count
        ("u2", "purchase", 1), ("u2", "signup", 2), ("u2", "click", 5),
        # u3 greedy-completeness: signup@1 and @4; click@2; purchase@5 —
        # greedy anchors at 1 and still completes
        ("u3", "signup", 1), ("u3", "signup", 4),
        ("u3", "click", 2), ("u3", "purchase", 5),
        # u4 never signs up -> absent from output
        ("u4", "click", 1),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_type string, s int").select(
        "user_id", "event_type", F.timestamp_seconds(F.col("s")).alias("ts")
    )
    got = {
        r["user_id"]: (r["ts_1"], r["ts_2"], r["ts_3"], r["steps_completed"])
        for r in funnel_steps(
            ev, ["signup", "click", "purchase"]
        ).collect()
    }
    m = 1_000_000
    assert got == {
        "u1": (1 * m, 2 * m, 3 * m, 3),
        "u2": (2 * m, 5 * m, None, 2),
        "u3": (1 * m, 2 * m, 5 * m, 3),
    }


def test_session_paths_gap_cap_and_ties(spark):
    from omop2owl_vocab_spark.operators.funnel import session_paths

    m = 60 * 1_000_000  # one minute in micros
    rows = [
        # u1 session 1: a,b (gap 1 min); session 2 after 31 min: c
        ("u1", 1, "a", 0), ("u1", 2, "b", 1), ("u1", 3, "c", 32),
        # u2 mirrors u1's first session -> path 'a>b' counts twice
        ("u2", 4, "a", 100), ("u2", 5, "b", 101),
        # u3: equal timestamps — event_id must break the tie (4 < 5... use 6,7)
        ("u3", 6, "x", 200), ("u3", 7, "y", 200),
        # u4: cap at max_events=3 — 5 events, path keeps first 3
        ("u4", 8, "a", 300), ("u4", 9, "a", 301), ("u4", 10, "a", 302),
        ("u4", 11, "z", 303), ("u4", 12, "z", 304),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, mins long"
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds(F.col("mins") * 60).alias("ts"),
    )
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(ev, gap_minutes=30, max_events=3).collect()
    }
    assert got == {"a>b": 2, "c": 1, "x>y": 1, "a>a>a": 1}


def test_session_paths_exact_gap_merges(spark):
    # the strict-> rule: an event EXACTLY gap later stays in-session
    from omop2owl_vocab_spark.operators.funnel import session_paths

    ev = spark.createDataFrame(
        [("u", 1, "a", 0), ("u", 2, "b", 30 * 60)],
        "user_id string, event_id long, event_type string, s long",
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds(F.col("s")).alias("ts"),
    )
    got = [r["path"] for r in session_paths(ev, gap_minutes=30).collect()]
    assert got == ["a>b"]


def test_skipgram_window_and_order(spark):
    from omop2owl_vocab_spark.operators.text import skipgram_cooccurrence

    docs = spark.createDataFrame(
        [("a b c d",), ("a b",)], "text string"
    )
    got = {
        (r["w1"], r["w2"]): r["c_xy"]
        for r in skipgram_cooccurrence(
            docs, window=2, min_count=1, top_m=100
        ).collect()
    }
    # doc1 pairs: d1 (a,b)(b,c)(c,d); d2 (a,c)(b,d); doc2: (a,b)
    assert got == {
        ("a", "b"): 2, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 1, ("b", "d"): 1,
    }


def test_skipgram_short_docs_safe(spark):
    from omop2owl_vocab_spark.operators.text import skipgram_cooccurrence

    docs = spark.createDataFrame([("solo",), ("",), (None,)], "text string")
    assert skipgram_cooccurrence(docs, window=3, min_count=1).count() == 0


def test_transition_matrix_counts_and_fixed_point(spark):
    from omop2owl_vocab_spark.operators.funnel import transition_matrix

    rows = [
        # u1: a->b->a ; u2: a->b ; u3: a->c
        ("u1", 1, "a", 0), ("u1", 2, "b", 1), ("u1", 3, "a", 2),
        ("u2", 4, "a", 10), ("u2", 5, "b", 11),
        ("u3", 6, "a", 20), ("u3", 7, "c", 21),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, s long"
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds(F.col("s")).alias("ts"),
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_e4"])
        for r in transition_matrix(
            ev, user_col="user_id", type_col="event_type",
            ts_col="ts", id_col="event_id",
        ).collect()
    }
    # from 'a': 3 transitions (a>b x2, a>c x1) -> 20000//3, 10000//3
    # from 'b': 1 transition (b>a) -> 10000
    assert got == {
        ("a", "b"): (2, 6666),
        ("a", "c"): (1, 3333),
        ("b", "a"): (1, 10000),
    }


def test_transition_matrix_tie_and_single_event_users(spark):
    from omop2owl_vocab_spark.operators.funnel import transition_matrix

    rows = [
        # equal timestamps: event_id breaks the tie -> x precedes y
        ("u1", 1, "x", 5), ("u1", 2, "y", 5),
        # single-event user contributes no transitions
        ("u2", 3, "z", 9),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id long, event_type string, s long"
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds(F.col("s")).alias("ts"),
    )
    got = [tuple(r) for r in transition_matrix(ev).collect()]
    assert got == [("x", "y", 1, 10000)]


def test_cohort_retention_triangle(spark):
    from omop2owl_vocab_spark.operators.funnel import cohort_retention

    D = 86400
    rows = [
        # u1: joins bucket 0, returns bucket 1
        ("u1", 0 * D), ("u1", 8 * D),
        # u2: two events inside bucket 0 -> counted ONCE at offset 0
        ("u2", 1 * D), ("u2", 2 * D),
        # u3: joins bucket 1
        ("u3", 9 * D),
    ]
    ev = spark.createDataFrame(rows, "user_id string, sec long").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    got = {
        (r["cohort_bucket"], r["offset_buckets"]): r["n_users"]
        for r in cohort_retention(ev, bucket_days=7).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        cohort_retention(ev, bucket_days=0)


def test_gap_fill_daily_zero_fills_span(spark):
    from omop2owl_vocab_spark.operators.timeseries import gap_fill_daily

    D = 86400
    ev = spark.createDataFrame(
        [("a", 0 * D), ("a", 0 * D), ("a", 3 * D), ("b", 5 * D)],
        "k string, sec long",
    ).select("k", F.timestamp_seconds(F.col("sec")).alias("ts"))
    got = [
        (r["key"], r["day"], r["n"])
        for r in gap_fill_daily(ev, "k").orderBy("key", "day").collect()
    ]
    # a: days 0..3 with zeros at 1,2 and a 2-count at 0; b: single day
    assert got == [
        ("a", 0, 2), ("a", 1, 0), ("a", 2, 0), ("a", 3, 1), ("b", 5, 1),
    ]


def test_rolling_daily_trailing_window(spark):
    from omop2owl_vocab_spark.operators.timeseries import (
        gap_fill_daily, rolling_daily,
    )

    D = 86400
    ev = spark.createDataFrame(
        [("a", 0 * D), ("a", 0 * D), ("a", 3 * D)],
        "k string, sec long",
    ).select("k", F.timestamp_seconds(F.col("sec")).alias("ts"))
    got = [
        (r["day"], r["sum_w"], r["days_w"], r["avg_e4"])
        for r in rolling_daily(gap_fill_daily(ev, "k"), window_days=3)
        .orderBy("day").collect()
    ]
    # days 0..3 with n = 2,0,0,1; 3-day trailing sums: 2,2,2,1
    assert got == [
        (0, 2, 1, 20000), (1, 2, 2, 10000),
        (2, 2, 3, 6666), (3, 1, 3, 3333),
    ]
    import pytest as _pt
    with _pt.raises(ValueError):
        rolling_daily(gap_fill_daily(ev, "k"), window_days=0)


def test_transition_matrix_null_ts_excluded(spark):
    from omop2owl_vocab_spark.operators.funnel import transition_matrix

    # review regression: NULL ts sorts first in Spark / last in DuckDB —
    # the operator now excludes those rows entirely
    ev = spark.createDataFrame(
        [("u", 1, "a", 0), ("u", 2, "b", 1), ("u", 3, "c", None)],
        "user_id string, event_id long, event_type string, s long",
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_seconds(F.col("s")).alias("ts"),
    )
    got = [tuple(r) for r in transition_matrix(ev).collect()]
    assert got == [("a", "b", 1, 10000)]
