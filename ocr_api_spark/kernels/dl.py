"""Driving-licence extraction kernels.

Ports of ``extract_name_from_text`` (app.py:5148-5162),
``extract_address`` (app.py:5165-5193), ``address_breaker``
(app.py:5194-5226), ``extract_dl_number`` (app.py:5228-5248),
``extract_pincode`` (app.py:5250-5275), ``extract_dl_info``
(app.py:5278-5319).  These live *after* the ``from datetime import
datetime`` rebinding at app.py:5096, so date sorting uses the class.
"""

from __future__ import annotations

import re

from datetime import datetime

from ocr_api_spark.kernels.common import fix_text

# r8: precompiled hot-path patterns (module-level, once per worker)
_RX0 = re.compile(r"NAME[:\-]?\s*([A-Z ]{3,})")
_RX1 = re.compile(r"[A-Z ]{3,}")
_RX2 = re.compile(r"^(ADDRESS|ADD)\b|^(ADDRESS|ADD)[A-Z]")
_RX3 = re.compile(r"^(ADDRESS|ADD)[:\-\s]*")
_RX4 = re.compile(r"(?<!\d)(\d{6})(?!\d)")
_RX5 = re.compile(r"PIN[:\s\-]*?(\d{6})\b")

_DL_PATTERN = re.compile(r"\b[A-Z]{2}\d{2}[A-Z]?\d{4,5}\d{5,8}\b")
_DATE_RE = re.compile(r"\d{2}[-/]\d{2}[-/]\d{4}")

_ADDRESS_STOP_WORDS = ["PIN", "AUTH", "DATE", "VALID", "ISSUING", "FORM", "CLASS", "SIGNATURE", "COV"]


def extract_name_from_text(text: str) -> str | None:
    """app.py:5148-5162 — inline ``NAME: X`` match, else the next two
    lines full-matching ``[A-Z ]{3,}`` minus excluded keywords."""
    lines = text.upper().split("\n")
    for i, line in enumerate(lines):
        if "NAME" in line:
            match = _RX0.search(line)
            if match:
                return match.group(1).strip()
            for j in range(i + 1, min(i + 3, len(lines))):
                candidate = lines[j].strip()
                if _RX1.fullmatch(candidate) and not any(
                    x in candidate for x in ["S/W/D", "DOB", "ADDRESS"]
                ):
                    return candidate
    return None


def extract_address(text: str) -> list:
    """app.py:5165-5193 — arm on an ADDRESS/ADD prefix line, collect
    until a stop word or two collected lines."""
    text_upper = text.upper()
    lines = text_upper.split("\n")
    address_lines: list[str] = []
    collect = False
    for i, line in enumerate(lines):
        line_stripped = line.strip()
        if _RX2.match(line_stripped):
            collect = True
            cleaned_line = _RX3.sub("", line_stripped)
            if cleaned_line:
                address_lines.append(cleaned_line)
            continue
        if collect:
            if any(stop_word in line_stripped for stop_word in _ADDRESS_STOP_WORDS):
                break
            if line_stripped:
                address_lines.append(line_stripped)
            if len(address_lines) >= 2:
                break
    return address_lines


def address_breaker(address: str, l: int, index: int) -> str | None:
    """app.py:5194-5226 — greedy word wrap of the merged address into up
    to three lines shorter than ``l``; a trailing ``0`` is stripped.
    Raises IndexError on an empty address exactly like the reference."""
    if address.strip()[-1] == "0":
        address = address.strip()[:-1]
    splitedaddress = address.replace("  ", " ").split(" ")
    add1 = ""
    add2 = ""
    add3 = ""
    add1full = False
    add2full = False
    for i in splitedaddress:
        if len(add1) + len(i) < l and add1full == False:  # noqa: E712
            add1 += i + " "
        else:
            add1 = add1.strip()
            add1full = True
        if len(add2) + len(i) < l and add1full == True and add2full == False:  # noqa: E712
            add2 += i + " "
        elif len(add2) + len(i) >= l:
            add2 = add2.strip()
            add2full = True
        if len(add3) + len(i) < l and add2full == True:  # noqa: E712
            add3 += i + " "
        elif len(add3) + len(i) >= l and add2full == True:  # noqa: E712
            add3 = add3.strip()
            break
    if index == 1:
        return str(add1.strip())
    if index == 2:
        return str(add2.strip())
    if index == 3:
        return str(add3.strip())
    return None


def extract_dl_number(text: str) -> str | None:
    """app.py:5228-5248 — space/dash-stripped uppercase scan for the DL
    grammar, with a DL/LICENCE label-line fallback."""
    text = fix_text(text)
    text_upper = text.upper()
    lines = text_upper.split("\n")

    normalized_text = text_upper.replace(" ", "").replace("-", "")
    match = _DL_PATTERN.search(normalized_text)
    if match:
        return match.group()

    for i, line in enumerate(lines):
        if "DL" in line or "LICENCE NO" in line or "LICENCE" in line:
            for j in range(i, min(i + 2, len(lines))):
                cleaned = lines[j].replace(" ", "").replace("-", "")
                match = _DL_PATTERN.search(cleaned)
                if match:
                    return match.group()
    return None


def _normalize_digits(text: str) -> str:
    return text.upper().replace("O", "0").replace("L", "1").replace("|", "1")


def extract_pincode(address_lines: list, full_text: str) -> str | None:
    """app.py:5250-5275 — reverse scan of the address lines with digit
    confusion repair, then a labelled-PIN fallback over the raw text."""
    for line in reversed(address_lines):
        norm_line = _normalize_digits(line)
        match = _RX4.search(norm_line)
        if match:
            return match.group(1)

    norm_text = _normalize_digits(full_text)
    match = _RX5.search(norm_text)
    if match:
        return match.group(1)
    return None


def parse_flexible_date(d: str) -> datetime:
    """app.py:5302-5304."""
    d = d.replace("/", "-")
    return datetime.strptime(d, "%d-%m-%Y")


def extract_dl_info(text: str) -> dict:
    """app.py:5278-5319 — the DL document assembly: name, DL number,
    3-line wrapped address, pincode, earliest parseable date as DOB."""
    raw_text = text
    text = fix_text(text)

    name = extract_name_from_text(raw_text)
    dl_number = extract_dl_number(raw_text)

    address_lines = extract_address(raw_text)
    merged_address = " ".join(address_lines).strip()
    add1 = address_breaker(merged_address, 20, 1)
    add2 = address_breaker(merged_address, 20, 2)
    add3 = address_breaker(merged_address, 20, 3)

    structured_address = {}
    if add1:
        structured_address["line_1"] = add1
    if add2:
        structured_address["line_2"] = add2
    if add3:
        structured_address["line_3"] = add3

    pincode = extract_pincode(address_lines, raw_text)

    date_matches = _DATE_RE.findall(text)
    try:
        unique_dates = sorted(set(date_matches), key=parse_flexible_date)
    except Exception:
        unique_dates = date_matches

    dob = unique_dates[0] if unique_dates else None

    return {
        "dl_number": dl_number,
        "name": name,
        "address": structured_address,
        "pincode": pincode,
        "date_of_birth": dob,
    }
