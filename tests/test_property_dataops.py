"""Property-based invariants for the dedup family.

- Winnowing guarantee (Schleimer et al. thm 1): two docs sharing a
  substring of ≥ k + window − 1 normalized chars share ≥ 1 fingerprint.
- SimHash portability: the Arrow UDF's signature equals a pure-python
  recomputation of the SQL oracle's definition (md5-hexdigit nibbles,
  RE2-\\s tokenization) for arbitrary ASCII text.

One Spark round-trip per example is slow → examples capped; generators
favor whitespace/punctuation collisions.
"""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from omop2owl_vocab_spark.operators import dedup as D

TEXT = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\x00\r"
    ),
    min_size=0,
    max_size=80,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(prefix_a=TEXT, prefix_b=TEXT, shared=st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00\r"),
    min_size=16, max_size=40,
))
def test_winnow_shared_substring_guarantee(spark, prefix_a, prefix_b, shared):
    # guarantee applies to the NORMALIZED text (lowercase, \s+ → ' ') —
    # require ≥ k+w−1 chars to survive normalization
    norm_shared = re.sub(r"\s+", " ", shared.lower()).strip()
    k, w = 8, 4
    if len(norm_shared) < k + w - 1:
        return
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{prefix_a} {shared}"),
            Row(doc_id=2, text=f"{shared} {prefix_b}"),
        ]
    )
    fps = D.winnow_fingerprints(docs, k=k, window=w)
    by_id: dict = {1: set(), 2: set()}
    for r in fps.collect():
        by_id[r["id"]].add(r["fp"])
    assert by_id[1] & by_id[2], (prefix_a, shared, prefix_b)


def _simhash_py(text: str) -> int:
    """Pure-python twin of the SQL oracle definition."""
    from collections import Counter

    votes = [0] * 64
    toks = [x for x in re.split(r"[ \t\n\f\r]+", (text or "").lower()) if x]
    for tok, cnt in Counter(toks).items():
        h = hashlib.md5(tok.encode()).hexdigest()
        for i in range(64):
            d = int(h[i // 4], 16)
            bit = (d >> (i % 4)) & 1
            votes[i] += cnt * (2 * bit - 1)
    sig = sum(1 << i for i in range(64) if votes[i] > 0)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(TEXT, min_size=1, max_size=4))
def test_simhash_matches_oracle_definition(spark, texts):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r["id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _simhash_py(t), repr(t)
