"""Subword tokenizer: greedy longest-prefix semantics vs an independent
Python reference, validation, and the split→pack→slices flow running on
tokenizer-exact counts end-to-end."""

import re

import pytest
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.pack import pack_documents, pack_slices
from omop2owl_vocab_spark.operators.tokenize import (
    DEFAULT_SUBWORD_VOCAB,
    subword_token_counts,
    subword_vocab_from_corpus,
    subword_vocab_sql_values,
)


def _py_count(text, vocab):
    pieces = set(vocab)
    lens = sorted({len(p) for p in pieces}, reverse=True)
    total = 0
    for w in (x for x in re.split(r"[ \t\n\f\r]+", text.strip()) if x):
        pos = 0
        while pos < len(w):
            step = 1
            for L in lens:
                if len(w) - pos >= L and w[pos : pos + L] in pieces:
                    step = L
                    break
            pos += step
            total += 1
    return total


def test_subword_counts_match_python_reference(spark):
    rows = [
        (0, "the spark partition ingested data"),
        (1, "  whitespace   normalization\tand\ntabs  "),
        (2, "a"),
        (3, ""),
        (4, "xyzzyplugh"),  # nothing matches → all single chars
        (5, "tionmentwithpart"),  # back-to-back 4-gram pieces
        (6, "thethethe the theth"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in subword_token_counts(df).collect()}
    for did, text in rows:
        assert got[did] == _py_count(text, DEFAULT_SUBWORD_VOCAB), (did, text)


def test_subword_counts_custom_vocab_and_validation(spark):
    df = spark.createDataFrame([(1, "abcabc abc")], "doc_id long, text string")
    # vocab {"abc"}: abcabc → 2 pieces, abc → 1 piece
    got = subword_token_counts(df, vocab=["abc"]).collect()[0]["n_tokens"]
    assert got == 3
    # greedy prefers the longest piece at a position
    got2 = subword_token_counts(df, vocab=["ab", "abca"]).collect()[0]["n_tokens"]
    # abcabc: abca|b|c = 3; abc: ab|c = 2
    assert got2 == 5
    with pytest.raises(ValueError, match="non-empty"):
        subword_token_counts(df, vocab=[])
    with pytest.raises(ValueError, match="whitespace-free"):
        subword_token_counts(df, vocab=["a b"])
    with pytest.raises(ValueError, match=">=2"):
        subword_token_counts(df, vocab=["a"])


def test_subword_vocab_sql_values_quotes_and_dedups():
    vals = subword_vocab_sql_values(["ab", "ab", "o'k"])
    assert vals == "('ab'), ('o''k')"


def test_subword_counts_null_text_is_zero(spark):
    """NULL text normalizes to 0 tokens (F1 convention) — matching the
    oracle's LEFT JOIN + COALESCE(SUM, 0), so a NULL-text doc packs as a
    zero-token row instead of vanishing (review finding r5)."""
    df = spark.createDataFrame(
        [(1, None), (2, "the data")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_tokens"] for r in subword_token_counts(df).collect()}
    assert got[1] == 0 and got[2] > 0
    # and the vocab derivation ignores NULL docs rather than erroring
    assert subword_vocab_from_corpus(df, n_pieces=4).count() == 4


def test_subword_vocab_from_corpus(spark):
    """Derived pieces are exactly the most frequent character n-grams
    under the (count desc, piece asc) total order; words shorter than a
    piece length contribute nothing at that length (the sequence(1,0)
    descending-sequence trap)."""
    df = spark.createDataFrame(
        [(1, "aaab aaab z"), (2, "aaab")], "doc_id long, text string"
    )
    rows = subword_vocab_from_corpus(
        df, n_pieces=4, min_len=2, max_len=3
    ).collect()
    got = [(r["piece"], r["n_occurrences"]) for r in rows]
    # per 'aaab' (x3): aa x2, ab x1, aaa x1, aab x1; 'z' too short for 2
    assert got == [("aa", 6), ("aaa", 3), ("aab", 3), ("ab", 3)]
    with pytest.raises(ValueError, match="n_pieces"):
        subword_vocab_from_corpus(df, n_pieces=0)
    with pytest.raises(ValueError, match="min_len"):
        subword_vocab_from_corpus(df, min_len=3, max_len=2)


def test_subword_vocab_roundtrip_into_tokenizer(spark):
    """The corpus-derived merge table drives the greedy tokenizer: a
    learned-vocab tokenization end-to-end, counts matching the Python
    reference on the derived pieces."""
    docs = spark.createDataFrame(
        [(i, "the spark table streams data " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    pieces = [
        r["piece"]
        for r in subword_vocab_from_corpus(docs, n_pieces=16).collect()
    ]
    assert len(pieces) == 16 and all(2 <= len(p) <= 4 for p in pieces)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in subword_token_counts(docs, vocab=pieces).collect()
    }
    expect = _py_count("the spark table streams data " * 3, pieces)
    assert all(v == expect for v in got.values())
    # learned pieces must compress vs single-char fallback
    n_chars = sum(len(w) for w in ("the spark table streams data ".split()) * 3)
    assert expect < n_chars


def test_subword_vocab_topk_plan_no_global_sort(spark):
    """The top-k cut must compile to TakeOrderedAndProject (heap-based),
    never a global Sort — the same pin token_vocab carries."""
    df = spark.createDataFrame([(1, "abc def")], "doc_id long, text string")
    plan = (
        subword_vocab_from_corpus(df, n_pieces=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_pack_slices_invariants_on_bpe_counts(spark):
    """The full tokenizer → pack → slices flow: slice tiling and per-pack
    ctx sums hold on REAL subword counts (not planted fixtures)."""
    words = ["the", "spark", "partition", "data", "tionment", "xyz", "a"]
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array([F.lit(words[i % len(words)]) for i in range(40)]),
        ).alias("text"),
    )
    counts = subword_token_counts(docs)
    packed = pack_documents(counts, ctx_len=64, n_shards=3, n_tokens_col="n_tokens")
    slices = pack_slices(packed, ctx_len=64).collect()
    pk = {r["doc_id"]: r for r in packed.collect()}

    by_doc = {}
    for s in slices:
        by_doc.setdefault(s["doc_id"], []).append(s)
    assert set(by_doc) == {d for d, r in pk.items() if r["n_tokens"] > 0}
    for did, ss in by_doc.items():
        ss.sort(key=lambda s: s["doc_tok_start"])
        pos = 0
        for s in ss:
            assert s["doc_tok_start"] == pos
            pos = s["doc_tok_end"]
        assert pos == pk[did]["n_tokens"]
    sums, tail = {}, {}
    for s in slices:
        key = (s["shard"], s["pack_id"])
        sums[key] = sums.get(key, 0) + s["n_slice_tokens"]
        tail[s["shard"]] = max(tail.get(s["shard"], -1), s["pack_id"])
    for (shard, pid), tot in sums.items():
        assert tot == 64 or pid == tail[shard], (shard, pid, tot)


def test_chunk_documents_overlap_and_edges(spark):
    from omop2owl_vocab_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = [
        (r["doc_id"], r["chunk_idx"], r["char_start"], r["chunk"])
        for r in chunk_documents(df, chunk_len=4, overlap=1)
        .orderBy("doc_id", "chunk_idx").collect()
    ]
    # step=3: doc1 (len 10) -> ceil(9/3)=3 chunks, 1-char overlap;
    # doc2 shorter than chunk -> one whole-doc chunk; empty/null -> none
    assert got == [
        (1, 0, 0, "abcd"), (1, 1, 3, "defg"), (1, 2, 6, "ghij"),
        (2, 0, 0, "xy"),
    ]


def test_chunk_documents_shorter_than_overlap_and_validation(spark):
    import pytest as _pt
    from omop2owl_vocab_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    # len(2) < overlap(3): the pre-division clamp must still yield ONE chunk
    got = chunk_documents(df, chunk_len=5, overlap=3).collect()
    assert [(r["chunk_idx"], r["chunk"]) for r in got] == [(0, "ab")]
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_len=0)
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_len=4, overlap=4)


def test_chunk_documents_no_shuffle_plan(spark):
    from omop2owl_vocab_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_len=3, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
