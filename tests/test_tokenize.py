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
