"""Access-gate operator tests (check_auth decision table, app.py:163-194)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="access-tests", master="local[2]", shuffle_partitions=2)


def test_access_decision_table(session):
    from ocr_api_spark.operators.access import admitted, credit_decrements, with_access

    requests = session.createDataFrame(
        [
            ("r1", "c_ok", "pan"),
            ("r2", "c_noflag", "pan"),
            ("r3", "c_negcred_allowed", "pan"),
            ("r4", "c_negcred_denied", "pan"),
            ("r5", "c_missing", "pan"),
        ],
        "req_id string, company string, doc_type string",
    )
    accounts = session.createDataFrame(
        [
            ("c_ok", 1, 10, 0),
            ("c_noflag", 0, 10, 0),
            ("c_negcred_allowed", 1, -5, 1),
            ("c_negcred_denied", 1, -5, 0),
        ],
        "company string, access_flag int, credits_left int, is_negative_credit_allowed int",
    )
    out = {r["req_id"]: r for r in with_access(requests, accounts).collect()}
    assert out["r1"]["access_granted"] and out["r1"]["access_reason"] == " access granted"
    assert not out["r2"]["access_granted"] and out["r2"]["access_reason"] == " pan not provided "
    assert out["r3"]["access_granted"]
    assert not out["r4"]["access_granted"] and out["r4"]["access_reason"] == "credit not avilable"
    assert not out["r5"]["access_granted"] and out["r5"]["access_reason"] == "unauthorized access"

    adm = admitted(requests, accounts)
    assert {r["req_id"] for r in adm.collect()} == {"r1", "r3"}
    dec = {r["company"]: r["credits_used"] for r in credit_decrements(adm).collect()}
    assert dec == {"c_ok": 1, "c_negcred_allowed": 1}
