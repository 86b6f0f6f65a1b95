"""Streaming curation projections: the fused pii_scrub + domain_flags +
gopher_flags scan streams verbatim — stream output == batch output on the
same micro-batched input (r4 verdict #7), and the fused projection
matches the three standalone operators column-for-column."""

import datetime as dt
import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from omop2owl_vocab_spark.operators.text import (
    domain_flags,
    gopher_flags,
    pii_scrub,
)
from omop2owl_vocab_spark.streaming.curate_stream import (
    DOCS_STREAM_SCHEMA,
    curation_scan,
    curation_stream,
)

BASE = dt.datetime(2024, 1, 1, 8, 0, 0)
BLOCKLIST = ["bad.tracker.net", "spam.example.com"]

_GOOD = (
    "the quick brown fox jumps over the lazy dog and that was not all of "
    "it because with more than fifty words in here we keep going on and "
    "on with perfectly ordinary prose that has stopwords and letters in "
    "every single word so the gopher rules are satisfied by this document "
    "which mentions https://ok.example.org once for good measure today"
)


def _doc(i, minutes, text):
    return Row(doc_id=i, ts=BASE + dt.timedelta(minutes=minutes), text=text)


def _fixture_chunks():
    return [
        [
            _doc(1, 0, _GOOD),
            _doc(2, 1, "contact me at a.b@example.com or 10.0.0.1 now"),
        ],
        [
            _doc(3, 5, "see https://bad.tracker.net/x and https://ok.org/y"),
            _doc(4, 6, "- bullet\n- bullet\n- bullet"),
        ],
        [_doc(5, 7, ""), _doc(6, 8, "… … … #")],
    ]


def test_curation_scan_matches_standalone_operators(spark):
    rows = [r for chunk in _fixture_chunks() for r in chunk]
    df = spark.createDataFrame(rows, DOCS_STREAM_SCHEMA)
    fused = {r["doc_id"]: r.asDict() for r in curation_scan(df, BLOCKLIST).collect()}
    pii = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    dom = {r["doc_id"]: r.asDict() for r in domain_flags(df, BLOCKLIST).collect()}
    gop = {r["doc_id"]: r.asDict() for r in gopher_flags(df).collect()}
    assert set(fused) == set(pii)
    for did, f in fused.items():
        for k, v in pii[did].items():
            assert f[k] == v, (did, k)
        for k, v in dom[did].items():
            assert f[k] == v, (did, k)
        for k, v in gop[did].items():
            assert f[k] == v, (did, k)
    # sanity on the fixture: PII doc flagged, blocklist doc flagged,
    # the long prose doc passes gopher
    assert fused[2]["has_pii"] and fused[2]["n_emails"] == 1
    assert fused[3]["blocked"] and fused[3]["n_blocked_domains"] == 1
    assert fused[1]["keep"] and not fused[4]["keep"]


def test_curation_scan_is_single_stage_no_join(spark):
    """The fused projection must stay join-free and shuffle-free: one
    scan, CollapseProject-folded selects, nothing else."""
    rows = [r for chunk in _fixture_chunks() for r in chunk]
    df = spark.createDataFrame(rows, DOCS_STREAM_SCHEMA)
    plan = (
        curation_scan(df, BLOCKLIST)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_curation_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, chunk in enumerate(_fixture_chunks()):
        if i:
            time.sleep(1.1)  # deterministic file order (mtime-based)
        spark.createDataFrame(chunk, DOCS_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(src, mode="append")

    out = str(tmp_path / "out")
    q = curation_stream(spark, src, out, str(tmp_path / "ckpt"), BLOCKLIST)
    assert q.awaitTermination(120), "stream did not finish in time"

    streamed = {
        r["doc_id"]: r.asDict() for r in spark.read.parquet(out).collect()
    }
    batch_in = spark.read.parquet(src)
    batch = {
        r["doc_id"]: r.asDict()
        for r in curation_scan(batch_in, BLOCKLIST).collect()
    }
    assert streamed == batch
    assert len(streamed) == 6
