"""Property tests for the round-5 continuation operators: each checked
against a plain-Python reference model on randomized inputs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omop2owl_vocab_spark.operators.graph import reciprocity
from omop2owl_vocab_spark.operators.text import trigram_lm, url_dedup
from omop2owl_vocab_spark.operators.timeseries import interval_merge

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=40,
)


@settings(**_SETTINGS)
@given(edges=EDGES)
def test_reciprocity_matches_python_model(spark, edges):
    e = {(a, b) for a, b in edges if a != b}
    mutual = sum(1 for (a, b) in e if (b, a) in e)  # counts each dir once
    want = (len(e), mutual)
    if not e:
        df = spark.createDataFrame([(0, 0)], "src long, dst long")
    else:
        df = spark.createDataFrame(sorted(e), "src long, dst long")
    r = reciprocity(df).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == want
    if want[0]:
        assert r["reciprocity_e4"] == (want[1] * 10000) // want[0]


INTERVALS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 20)),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(iv=INTERVALS)
def test_interval_merge_matches_python_sweep(spark, iv):
    rows = [("k", s, s + d) for s, d in iv]
    # python reference: sort by start, merge touching/overlapping
    islands = []
    for s, e in sorted((r[1], r[2]) for r in rows):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["start"], r["end"], r["n_intervals"], r["covered"])
        for r in interval_merge(df, ["k"], "s", "e").collect()
    )
    want = sorted((s, e, n, e - s) for s, e, n in islands)
    assert got == want


WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "Dd"]), min_size=0, max_size=12
)


@settings(**_SETTINGS)
@given(docs=st.lists(WORDS, min_size=1, max_size=6))
def test_trigram_lm_matches_python_counts(spark, docs):
    from collections import Counter

    counts = Counter()
    for ws in docs:
        toks = [w.lower() for w in ws]
        for i in range(len(toks) - 2):
            counts[(toks[i], toks[i + 1], toks[i + 2])] += 1
    ctx = Counter()
    for (w1, w2, _w3), n in counts.items():
        ctx[(w1, w2)] += n
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"], r["w3"]): (r["n"], r["prob_e4"])
        for r in trigram_lm(df).collect()
    }
    want = {
        k: (n, (n * 10000) // ctx[(k[0], k[1])]) for k, n in counts.items()
    }
    assert got == want


URL_PATH = st.text(
    alphabet=st.characters(codec="ascii", categories=["Ll", "Lu", "Nd"]),
    min_size=0,
    max_size=8,
)


@settings(**_SETTINGS)
@given(host=URL_PATH, path=URL_PATH, q=URL_PATH)
def test_url_canonicalization_idempotent(spark, host, path, q):
    # feeding url_dedup's own output back in must be a fixed point
    url = f"https://H{host}.EXAMPLE.com:443/{path}/?utm_x=1&z={q}&a=b#f"
    df1 = spark.createDataFrame([(1, "see " + url)], "doc_id long, text string")
    first = url_dedup(df1).collect()
    assert len(first) == 1
    canon = first[0]["url"]
    df2 = spark.createDataFrame(
        [(1, "see " + canon)], "doc_id long, text string"
    )
    again = url_dedup(df2).collect()
    assert len(again) == 1 and again[0]["url"] == canon
