"""Frozen golden-fixture test (FIXTURES.md §2).

tests/fixtures/golden_spans.json was generated ONCE by the independent
pure-Python oracle and committed; it is immutable. Unlike the live
oracle-comparison e2e test, this catches a change that drifts BOTH the
pipeline and the oracle together (frozen semantics are the contract:
SURVEY.md §7.3.6)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdftableextractor_spark.operators.extract import extract_spans

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_spans.json")


def test_pipeline_matches_frozen_fixture(spark, tmp_path):
    with open(FIXTURE) as f:
        blob = json.load(f)
    docs = blob["documents"]
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
                "spans": pa.array(
                    [
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in d["spans"]
                        ]
                        for d in docs
                    ],
                    pa.list_(span_t),
                ),
            }
        ),
        path,
    )
    got = sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in extract_spans(spark.read.parquet(path)).collect()
    )
    exp = sorted(
        (e["doc_id"], e["order"], e["kind"], e["text"], e["media_ref"])
        for e in blob["expected_spans"]
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == e, f"frozen-fixture mismatch: got={g!r} expected={e!r}"


def test_corpus_generator_is_frozen(spark):
    """The generator itself must stay deterministic: regenerating the
    fixture's doc indices must byte-match the committed inputs."""
    from pdftableextractor_spark import corpus

    with open(FIXTURE) as f:
        blob = json.load(f)
    for idx, committed in zip(blob["doc_indices"], blob["documents"]):
        assert corpus.gen_document(blob["seed"], idx) == committed
