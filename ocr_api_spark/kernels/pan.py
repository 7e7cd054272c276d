"""PAN card extraction kernels.

Ports of ``extract_pan_data`` (app.py:567-620), ``extract_old_pan_data``
(app.py:509-564) and the endpoint cascade (app.py:2170-2178).
"""

from __future__ import annotations

import re

from ocr_api_spark.kernels.common import (
    alpha_space,
    correct_pan_number,
    normalize_dob_format,
    sanitize_b,
    search_date,
    split_lines,
)

_PAN_RELAXED = re.compile(r"[A-Z]{5}[0-9A-Z]{4}[A-Z]")
_PAN_STRICT = re.compile(r"[A-Z]{5}[0-9]{4}[A-Z]")
_PAN_CLEAN = re.compile(r"[^A-Z0-9]+")

_NEW_PAN_NAME_EXCLUDE = ["GOVT.", "INCOME TAX", "PERMANENT ACCOUNT NUMBER", "CARD", "DATE OF BIRTH", "FATHER"]


def _empty() -> dict:
    return {"ocr_name": "", "ocr_father_name": "", "ocr_dob": "", "ocr_pan_number": ""}


def _try_pan_number(clean_line: str) -> str | None:
    """Relaxed match + OCR repair + strict re-validation (app.py:588-597)."""
    pan_match = _PAN_RELAXED.search(clean_line)
    if pan_match:
        correct_pan = correct_pan_number(pan_match.group(0))
        if len(correct_pan) == 10:
            strict = _PAN_STRICT.search(correct_pan)
            if strict:
                return correct_pan_number(strict.group(0))
    return None


def extract_pan_data(text: str) -> dict:
    """New-layout PAN extractor (app.py:567-620): NAME/FATHER label
    anchoring, first-match DOB, relaxed PAN with repair."""
    extracted_data = _empty()
    lines = split_lines(text)
    for i, line in enumerate(lines):
        clean_line = sanitize_b(line)

        pan = _try_pan_number(clean_line)
        if pan is not None:
            extracted_data["ocr_pan_number"] = pan
            continue

        dob_match = search_date(clean_line)
        if dob_match and not extracted_data["ocr_dob"]:
            extracted_data["ocr_dob"] = normalize_dob_format(dob_match)
            continue

        if (
            "NAME" in clean_line.upper()
            and i + 1 < len(lines)
            and not extracted_data["ocr_name"]
            and not any(keyword in line for keyword in _NEW_PAN_NAME_EXCLUDE)
        ):
            extracted_data["ocr_name"] = alpha_space(lines[i + 1]).strip()
            continue

        if "FATHER" in clean_line.upper() and i + 1 < len(lines):
            extracted_data["ocr_father_name"] = alpha_space(lines[i + 1]).strip()
            continue

    extracted_data["ocr_name"] = alpha_space(extracted_data["ocr_name"]).strip()
    extracted_data["ocr_father_name"] = alpha_space(extracted_data["ocr_father_name"]).strip()
    extracted_data["ocr_pan_number"] = _PAN_CLEAN.sub("", extracted_data["ocr_pan_number"]).strip()
    return extracted_data


def extract_old_pan_data(text: str) -> dict:
    """Old-layout PAN extractor (app.py:509-564): TAX/INDIA two-line
    anchoring; the father-name line keeps overwriting while a name is
    set and no DOB seen yet (reference quirk, app.py:555-557)."""
    extracted_data = _empty()
    lines = split_lines(text)
    for i, line in enumerate(lines):
        clean_line = sanitize_b(line)

        pan = _try_pan_number(clean_line)
        if pan is not None:
            extracted_data["ocr_pan_number"] = pan
            continue

        dob_match = search_date(clean_line)
        if dob_match:
            extracted_data["ocr_dob"] = normalize_dob_format(dob_match)
            continue

        if (
            "TAX" in clean_line.upper()
            and i + 1 < len(lines)
            and "INDIA" in sanitize_b(lines[i + 1]).upper()
            and not extracted_data.get("ocr_name")
            and i + 2 < len(lines)
        ):
            extracted_data["ocr_name"] = alpha_space(lines[i + 2]).strip()
            continue
        elif (
            "TAX" in clean_line.upper()
            and i + 1 < len(lines)
            and "INDIA" not in sanitize_b(lines[i + 1]).upper()
            and not extracted_data.get("ocr_name")
        ):
            extracted_data["ocr_name"] = alpha_space(lines[i + 1]).strip()
            # no continue — falls through (reference quirk, app.py:551)

        if extracted_data.get("ocr_name") and not extracted_data.get("ocr_dob"):
            extracted_data["ocr_father_name"] = alpha_space(lines[i]).strip()
            continue

    extracted_data["ocr_name"] = alpha_space(extracted_data["ocr_name"]).strip()
    extracted_data["ocr_father_name"] = alpha_space(extracted_data["ocr_father_name"]).strip()
    extracted_data["ocr_pan_number"] = _PAN_CLEAN.sub("", extracted_data["ocr_pan_number"]).strip()
    return extracted_data


def extract_pan(text: str) -> dict:
    """The live cascade (app.py:2170-2178): new-layout first, fall back
    to old-layout when no name, then normalize the DOB."""
    extracted_data = extract_pan_data(text)
    if not extracted_data.get("ocr_name"):
        extracted_data = extract_old_pan_data(text)
    extracted_data["ocr_dob"] = normalize_dob_format(extracted_data["ocr_dob"])
    return extracted_data
