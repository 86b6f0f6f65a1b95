"""Dedup / text / similarity / multimodal operator tests (closed-form)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators import dedup as D
from omop2owl_vocab_spark.operators import multimodal as M
from omop2owl_vocab_spark.operators import similarity as S
from omop2owl_vocab_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=3, text="completely different content entirely here now"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),  # = 1
        Row(doc_id=5, text="der hund und die katze und der vogel"),
        Row(doc_id=6, text=""),
    ]
    return spark.createDataFrame(rows)


def test_exact_duplicates(spark, docs):
    pairs = {tuple(r) for r in D.exact_duplicates(docs).collect()}
    assert pairs == {(1, 4)}


def test_jaccard_pairs(spark, docs):
    sh = D.word_shingles(docs, 3)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_e4"]
        for r in D.jaccard_pairs(sh, threshold=0.5).collect()
    }
    # docs 1/4 identical → jaccard 1.0; 1/2 share 6 of 7 shingles each →
    # |∩|=6, |∪|=8 → 0.75
    assert got[(1, 4)] == 10000
    assert got[(1, 2)] == 7500
    assert got[(2, 4)] == 7500
    assert (1, 3) not in got


def test_minhash_lsh_finds_near_dups(spark, docs):
    sig = D.minhash_signatures(D.word_shingles(docs, 3), num_hashes=32)
    cand = {tuple(r) for r in D.lsh_candidate_pairs(sig, bands=8).collect()}
    assert (1, 4) in cand  # identical docs always collide
    assert (1, 2) in cand  # 0.75 jaccard: expected with 8 bands of 4


def test_simhash(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]  # identical text → identical signature
    near = {tuple(r) for r in D.simhash_near_duplicates(
        D.simhash_signatures(docs)).collect()}
    assert (1, 4) in near


def test_token_stats(spark, docs):
    got = {r["doc_id"]: r for r in T.token_stats(docs).collect()}
    assert got[1]["n_tokens"] == 9
    assert got[6]["n_tokens"] == 0
    assert got[1]["n_chars"] == 43


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_guess"] for r in T.lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "de"
    assert got[3] == "und"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a  b\tc"), Row(doc_id=2, text="a b c")]
    )
    fps = [r["fp_md5"] for r in T.fingerprint(df).collect()]
    assert fps[0] == fps[1]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.9, 0.1, 0.0]),   # close to 1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),   # orthogonal to 1
        Row(vec_id=4, embedding=[1.0, 0.01, 0.0]),  # very close to 1
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk(spark, vectors):
    out = S.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 1), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(4, 1), (2, 2)]


def test_ann_recall_vs_brute_force(spark, vectors):
    # near-identical vectors land in the same hyperplane bucket
    out = S.ann_topk_bucketed(
        vectors, vectors.filter(F.col("vec_id") == 1), k=2, n_bits=4
    )
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert 4 in neighbors


def test_embedding_near_duplicates(spark, vectors):
    pairs = {
        (r["id_a"], r["id_b"]) for r in
        S.embedding_near_duplicates(vectors, threshold=0.99).collect()
    }
    assert (1, 4) in pairs
    assert (1, 3) not in pairs


def test_multimodal_plumbing(spark, docs):
    media = M.synth_media(docs.filter(F.col("doc_id") <= 2))
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert set(feats) == {1, 2}
    assert len(feats[1]["features"]) == 16
    assert abs(sum(feats[1]["features"]) - 1.0) < 1e-6
    assert feats[1]["n_bytes"] == 43


def test_multimodal_real_decode_is_stubbed(spark, docs):
    with pytest.raises(NotImplementedError):
        M.extract_features(M.synth_media(docs), fake=False)
