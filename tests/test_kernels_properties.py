"""Property tests over the kernels (SURVEY.md §5.2.3).

- normalizer idempotence (F5, F11)
- extractor totality on arbitrary printable input *except* the
  positional IndexError paths the reference itself has (those must
  raise — the pipeline catches them per row, like the Flask handler)
- fuzz-ratio metric properties
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_api_spark.kernels import bank, boilerplate, common, matching, pan

printable_text = st.text(alphabet=string.printable, max_size=400)
lines_text = st.lists(st.text(alphabet=string.ascii_uppercase + string.digits + " /,-.", max_size=40), max_size=12).map(
    "\n".join
)


@given(printable_text)
@settings(max_examples=300, deadline=None)
def test_normalize_dob_idempotent(s):
    once = common.normalize_dob_format(s)
    assert common.normalize_dob_format(once) == once


@given(st.text(alphabet=string.ascii_uppercase + string.digits + "|: ​", max_size=30))
@settings(max_examples=300, deadline=None)
def test_normalize_ifsc_idempotent(s):
    once = bank.normalize_ifsc(s)
    assert bank.normalize_ifsc(once) == once


@given(printable_text)
@settings(max_examples=200, deadline=None)
def test_pan_extractors_total(s):
    # The PAN extractors never index past their own line list — total.
    out = pan.extract_pan_data(s)
    assert set(out) == {"ocr_name", "ocr_father_name", "ocr_dob", "ocr_pan_number"}
    pan.extract_old_pan_data(s)


@given(printable_text)
@settings(max_examples=200, deadline=None)
def test_financial_and_ifsc_total(s):
    bank.extract_financial_data(s)
    bank.extract_bank_data(s)
    bank.extract_ifsc_code_from_text(s)


@given(printable_text, printable_text)
@settings(max_examples=300, deadline=None)
def test_indel_ratio_metric(a, b):
    r = matching.indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == matching.indel_ratio(b, a)
    assert matching.indel_ratio(a, a) == 100.0


@given(printable_text)
@settings(max_examples=100, deadline=None)
def test_boilerplate_total(s):
    out = boilerplate.extract_main_text("<html><body><p>" + s + "</p></body></html>")
    assert isinstance(out, str)
