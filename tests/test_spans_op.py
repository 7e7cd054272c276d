"""Spans operator test (kernel get_index semantics through Spark)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="spans-tests", master="local[2]", shuffle_partitions=2)


def test_with_spans(session):
    from ocr_api_spark.operators.spans_op import with_spans

    df = session.createDataFrame(
        [("u1", "AB AB CD", "AB", "CD"), ("u2", "nothing here", "ZZ", None)],
        "url string, text string, pan string, dob string",
    )
    out = {r["url"]: r["spans"] for r in with_spans(df, "text", {"PAN": "pan", "DOB": "dob"}).collect()}
    u1 = [(s["start"], s["end"], s["label"]) for s in out["u1"]]
    assert u1 == [(0, 2, "PAN"), (3, 5, "PAN"), (6, 8, "DOB")]
    assert out["u2"] == []
