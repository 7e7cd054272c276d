"""Differential parity tests: our kernels vs the reference's own
function sources (exec'd from the read-only checkout) over a seeded
synthetic corpus of every layout family plus junk.

Exception parity matters too — the reference lets IndexError etc.
escape to the endpoint handler, and our pipeline reproduces that
contract — so both sides run under capture and we compare
(result | exception type).
"""

from __future__ import annotations

import pytest

from ocr_api_spark.kernels import aadhaar, bank, common, dl, matching, pan, passport, spans
from tests.conftest import run_ref
from tests.gen_texts import corpus

CORPUS = corpus(seed=42, n_per_family=40)
TEXTS = [text for _family, text in CORPUS]


def outcome(fn, *args):
    try:
        return ("ok", fn(*args))
    except Exception as e:  # noqa: BLE001 - exception parity is the point
        return ("err", type(e).__name__)


def assert_parity(reference_ns, ref_name, ours, texts=TEXTS):
    for text in texts:
        ref = outcome(lambda t: run_ref(reference_ns, ref_name, t), text)
        got = outcome(ours, text)
        assert got == ref, f"{ref_name} diverged on input:\n{text!r}\nref={ref}\nours={got}"


# --- scalar helpers --------------------------------------------------------


def test_normalize_dob_format(reference_ns):
    cases = ["01/02/1990", "01-02-1990", "1/2/90", "/01/021990/", "", "abc", "01/02/1990/"]
    for c in cases:
        assert common.normalize_dob_format(c) == run_ref(reference_ns, "normalize_dob_format", c)


def test_correct_pan_number(reference_ns):
    cases = ["ABCDESA7TF", "ABCDE1234F", "ABCDESSSSF", "SHORT", "", "ABCDEATST1", "ABCDETTTTZ"]
    for c in cases:
        assert common.correct_pan_number(c) == run_ref(reference_ns, "correct_pan_number", c)


def test_clean_text_effective(reference_ns):
    cases = ["a|b.c:d\ne", "HeLLo | World.", ""]
    for c in cases:
        assert common.clean_text(c) == run_ref(reference_ns, "clean_text", c)


def test_string_matching_percentage(reference_ns):
    cases = [("rahul", "rahul"), ("rahul", "RAHUL "), (None, "x"), ("", ""), ("abc", "abd"), (None, None)]
    for a, b in cases:
        assert matching.string_matching_percentage(a, b) == run_ref(
            reference_ns, "string_matching_percentage", a, b
        )


# --- document extractors ---------------------------------------------------


def test_pan_new_parity(reference_ns):
    assert_parity(reference_ns, "extract_pan_data", pan.extract_pan_data)


def test_pan_old_parity(reference_ns):
    assert_parity(reference_ns, "extract_old_pan_data", pan.extract_old_pan_data)


def test_digilocker_parity(reference_ns):
    assert_parity(reference_ns, "DigiLockeraadhar", aadhaar.digilocker_aadhaar)


def test_aadhaar_front_parity(reference_ns):
    assert_parity(reference_ns, "extract_front_page_adahar", aadhaar.extract_front_page_adahar)


def test_aadhaar_front_reissue_parity(reference_ns):
    assert_parity(
        reference_ns, "extract_front_page_reissue_adahar", aadhaar.extract_front_page_reissue_adahar
    )


def test_aadhaar_full_parity(reference_ns):
    assert_parity(reference_ns, "extract_full_page_adahar", aadhaar.extract_full_page_adahar)


def test_aadhaar_both_parity(reference_ns):
    assert_parity(reference_ns, "extract_both_side_adahar", aadhaar.extract_both_side_adahar)


def test_aadhaar_both_reissue_parity(reference_ns):
    assert_parity(
        reference_ns, "extract_both_side_reissue_adahar", aadhaar.extract_both_side_reissue_adahar
    )


def test_aadhaar_cascade_parity(reference_ns):
    """The live 4-stage cascade (app.py:2697-2722) against a driver-side
    replay of the same gates over the lifted reference functions."""

    def ref_cascade(text):
        d = run_ref(reference_ns, "DigiLockeraadhar", text)
        if not d.get("ocr_name") or not d.get("ocr_address") or not d["ocr_dob"]:
            d = run_ref(reference_ns, "extract_full_page_adahar", text)
        if not d.get("ocr_name") or not d.get("ocr_address"):
            d = run_ref(reference_ns, "extract_both_side_adahar", text)
        if not d.get("ocr_name"):
            d = run_ref(reference_ns, "extract_front_page_adahar", text)
        d["ocr_dob"] = run_ref(reference_ns, "normalize_dob_format", d["ocr_dob"])
        return d

    for text in TEXTS:
        assert outcome(aadhaar.extract_aadhaar, text) == outcome(ref_cascade, text)


def test_bank_parity(reference_ns):
    assert_parity(reference_ns, "extract_bank_data", bank.extract_bank_data)


def test_financial_parity(reference_ns):
    assert_parity(reference_ns, "extract_financial_data", bank.extract_financial_data)


def test_ifsc_suite_parity(reference_ns):
    for text in TEXTS:
        assert outcome(bank.extract_ifsc_code_from_text, text) == outcome(
            lambda t: run_ref(reference_ns, "extract_ifsc_code_from_text", t), text
        )
    codes = ["SBIN0001234", "SB1N0O01234", "IFSC0123456", "icic0004321", "XX", "HDFC 0001234:", ""]
    for c in codes:
        assert bank.normalize_ifsc(c) == run_ref(reference_ns, "normalize_ifsc", c)
        assert bank.validate_relaxed_ifsc(c) == run_ref(reference_ns, "validate_relaxed_ifsc", c)


def test_dl_parity(reference_ns):
    assert_parity(reference_ns, "extract_dl_info", dl.extract_dl_info)


def test_dl_helpers_parity(reference_ns):
    for text in TEXTS:
        assert outcome(dl.extract_name_from_text, text) == outcome(
            lambda t: run_ref(reference_ns, "extract_name_from_text", t), text
        )
        assert outcome(dl.extract_address, text) == outcome(
            lambda t: run_ref(reference_ns, "extract_address", t), text
        )
        assert outcome(dl.extract_dl_number, text) == outcome(
            lambda t: run_ref(reference_ns, "extract_dl_number", t), text
        )


def test_address_breaker_parity(reference_ns):
    cases = [
        "12 STATION ROAD NEAR OLD TEMPLE MUMBAI MAHARASHTRA 400001",
        "A VERY LONG ADDRESS WITH MANY WORDS THAT KEEPS GOING AND GOING UNTIL WRAPPED0",
        "SHORT",
        "X 0",
        "",
    ]
    for address in cases:
        for index in (1, 2, 3):
            assert outcome(dl.address_breaker, address, 20, index) == outcome(
                lambda a, l, i: run_ref(reference_ns, "address_breaker", a, l, i), address, 20, index
            )


def test_passport_parity(reference_ns):
    assert_parity(reference_ns, "extract_passport_info", passport.extract_passport_info)


def test_passport_rear_parity(reference_ns):
    for text in TEXTS:
        assert outcome(passport.extract_address_and_pin, text) == outcome(
            lambda t: run_ref(reference_ns, "extract_address_and_pin", t), text
        )
        lines = text.splitlines()
        assert outcome(passport.extract_family_members, lines) == outcome(
            lambda ls: run_ref(reference_ns, "extract_family_members", ls), lines
        )


def test_get_index_parity(reference_ns):
    text = "INCOME TAX AQGPA7252E ARECONTY KARLNAKAR PRASAD YELLAPPA ARECONTY 08/07/1971"
    args = ("AQGPA7252E", "ARECONTY", "KARLNAKAR", "PRASAD", "YELLAPPA", "", "ARECONTY", "08/07/1971")
    assert spans.get_index(text, *args) == run_ref(reference_ns, "get_index", text, *args)
    assert spans.get_index("", *args) == run_ref(reference_ns, "get_index", "", *args)
