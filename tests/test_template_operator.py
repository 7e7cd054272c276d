"""Template-fold operator tests: kernel semantics + Spark assembly."""

from __future__ import annotations

import json

import pytest

from ocr_api_spark.kernels.matching import template_fold


def test_template_fold_kernel_first_clip_wins_and_early_break():
    felds = {"name": "RAHUL SHARMA", "account": "12345678"}
    clips = [
        ("name", ""),  # empty first clip: field enters matching_results but not total
        ("name", "RAHUL SHARMA"),  # non-empty retry: ocrdata set, totalenty False -> not in total
        ("account", "12345678"),
        ("name", "SOMEONE ELSE"),  # never reached for ocrdata (already set)
    ]
    ocrdata, results, average = template_fold(clips, felds)
    assert ocrdata == {"name": "RAHUL SHARMA", "account": "12345678"}
    assert results["account"] == 100.0
    # reference quirk: a field whose first clip was empty never enters the
    # running total, so average = 100 / 2
    assert average == 50.0


def test_template_fold_kernel_all_found():
    felds = {"a": "x", "b": "y"}
    clips = [("a", "x"), ("b", "y"), ("a", "z")]
    ocrdata, results, average = template_fold(clips, felds)
    assert average == 100.0


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="tmpl-tests", master="local[4]", shuffle_partitions=4)


def test_template_extraction_spark(session):
    from ocr_api_spark.operators.template import template_extraction

    docs = session.createDataFrame(
        [("d1", json.dumps({"name": "RAHUL SHARMA", "account": "12345678"}))],
        "document_id string, felds_json string",
    )
    templates = session.createDataFrame(
        [
            ("d1", 1, "name", 10.0, 20.0, 100.0, 15.0),
            ("d1", 2, "account", 10.0, 40.0, 100.0, 15.0),
        ],
        "document_id string, page int, field string, x double, y double, width double, height double",
    )
    clips = session.createDataFrame(
        [
            ("d1", 1, "name", "RAHUL SHARMA"),
            ("d1", 2, "account", "12345678"),
        ],
        "document_id string, page int, field string, clip_text string",
    )
    out = template_extraction(docs, templates, clips).collect()[0]
    assert out["ocrdata"] == {"name": "RAHUL SHARMA", "account": "12345678"}
    assert out["average_match_percentage"] == 100.0
