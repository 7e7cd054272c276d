"""Passport extraction kernels (front + rear pages).

Ports of ``extract_passport_number`` (app.py:5417-5422),
``extract_surname`` (app.py:5424-5456), ``extract_given_name``
(app.py:5457-5491), ``extract_dates`` (app.py:5511-5522),
``extract_passport_info`` (app.py:5524-5542),
``extract_address_and_pin`` (app.py:5545-5586),
``extract_family_members`` (app.py:5588-5631).
"""

from __future__ import annotations

import re

from datetime import datetime

from ocr_api_spark.kernels.common import fix_text

# r8: precompiled hot-path patterns (module-level, once per worker)
_RX0 = re.compile(r"\b([A-Z][0-9]{7})\b")
_RX1 = re.compile(r"\bS[UO]R?N?A?M[E]?\b")
_RX2 = re.compile(r".*S[UO]R?N?A?M[E]?\b[:\-\s/]*")
_RX3 = re.compile(r"[A-Z]{2,}")
_RX4 = re.compile(r".*GIVEN\s*NAME[S]?[):\/\-\s]*")
_RX5 = re.compile(r"[^A-Z ]+")
_RX6 = re.compile(r"[A-Z ]{2,}")
_RX7 = re.compile(r"\b(ADDRESS|ADD)\b")
_RX8 = re.compile(r"\b(\d{6})\b")
_RX9 = re.compile(r"[A-Z\s]{3,}")
_RX10 = re.compile(r"[^A-Z]")
_RX11 = re.compile(r"\bMOTHE?R?\b")

_DATE_RE = re.compile(r"\d{2}[-/]\d{2}[-/]\d{4}")


def extract_passport_number(text: str) -> str | None:
    """app.py:5417-5422 — ``\\b([A-Z][0-9]{7})\\b``."""
    match = _RX0.search(text)
    return match.group(1) if match else None


def extract_surname(lines: list, mrz_lines: list) -> str | None:
    """app.py:5424-5456 — fuzzy SURNAME label (S[UO]R?N?A?M[E]?), inline
    cleanup, safe next-2-line fallback, MRZ last resort."""
    forbidden_keywords = ["GIVEN", "NAMES", "NAME"]
    for i, line in enumerate(lines):
        line_upper = line.upper()
        if _RX1.search(line_upper):
            cleaned_inline = _RX2.sub("", line_upper).strip()
            if cleaned_inline and _RX3.fullmatch(cleaned_inline):
                return cleaned_inline
            for j in range(1, 3):
                if i + j < len(lines):
                    candidate = lines[i + j].strip().upper()
                    if _RX3.fullmatch(candidate) and not any(
                        kw in candidate for kw in forbidden_keywords
                    ):
                        return candidate
    if mrz_lines:
        part = mrz_lines[0].split("<<")[0]
        surname = part.replace("P<IND", "").strip("<")
        return surname
    return None


def extract_given_name(lines: list, mrz_lines: list) -> str | None:
    """app.py:5457-5491 — fuzzy GIVEN NAME label, inline strip, next-line
    fallback, MRZ second-field fallback."""
    for i, line in enumerate(lines):
        line_clean = line.strip().upper()
        if "GIVEN" in line_clean and "NAME" in line_clean:
            value = _RX4.sub("", line_clean).strip()
            value = _RX5.sub("", value)
            if len(value) < 3 or "GIVEN" in value:
                if i + 1 < len(lines):
                    next_line = lines[i + 1].strip().upper()
                    if _RX6.fullmatch(next_line):
                        return next_line
            else:
                return value
    if mrz_lines:
        parts = mrz_lines[0].split("<<")
        if len(parts) >= 2:
            given = parts[1].replace("<", " ").strip()
            return given
    return None


def extract_dates(text: str):
    """app.py:5511-5522 — all date patterns; sorted-unique when every
    date parses, else the raw (duplicated, document-order) list; first
    three positions are (dob, doi, doe)."""
    dates = _DATE_RE.findall(text)
    try:
        dates = sorted(set(dates), key=lambda d: datetime.strptime(d.replace("/", "-"), "%d-%m-%Y"))
    except Exception:
        pass
    dob = dates[0] if len(dates) > 0 else None
    doi = dates[1] if len(dates) > 1 else None
    doe = dates[2] if len(dates) > 2 else None
    return dob, doi, doe


def extract_passport_info(text: str) -> dict:
    """app.py:5524-5542 — front-page assembly."""
    lines = fix_text(text.upper()).split("\n")
    full_text = "\n".join(lines)
    mrz_lines = [line for line in lines if "<<" in line]

    data = {
        "passport_number": extract_passport_number(full_text),
        "surname": extract_surname(lines, mrz_lines),
        "given_name": extract_given_name(lines, mrz_lines),
    }
    dob, doi, doe = extract_dates(full_text)
    data["date_of_birth"] = dob
    data["date_of_issue"] = doi
    data["date_of_expiry"] = doe
    return data


def extract_address_and_pin(text: str):
    """app.py:5545-5586 — rear-page address: ADDRESS/ADD label + next 3
    lines, else the PIN-bearing line and two above; PIN from the
    collected lines with O→0 repair."""
    lines = [line.strip() for line in text.upper().split("\n") if line.strip()]
    address_lines: list[str] = []
    collecting = False

    for i, line in enumerate(lines):
        if not collecting and _RX7.search(line):
            collecting = True
            for j in range(1, 4):
                if i + j < len(lines):
                    address_lines.append(lines[i + j].strip())
            break

    if not collecting:
        for i, line in enumerate(lines):
            fixed_line = line.replace("O", "0")
            if _RX8.search(fixed_line):
                start = max(i - 2, 0)
                address_lines = lines[start : i + 1]
                collecting = True
                break

    if not collecting:
        return [], None

    pin_code = None
    for line in address_lines:
        fixed_line = line.replace("O", "0")
        match = _RX8.search(fixed_line)
        if match:
            pin_code = match.group(1)
            break
    return address_lines, pin_code


def extract_family_members(lines: list) -> dict:
    """app.py:5588-5631 — FATHER/GUARDIAN, MOTHER, SPOUSE labels over a
    letters-only collapse; value is the next 1-2 lines full-matching
    ``[A-Z\\s]{3,}``."""
    data = {
        "father_or_guardian": None,
        "mother": None,
        "spouse": None,
    }

    def find_name(start_idx: int) -> str | None:
        for j in range(1, 3):
            if start_idx + j < len(lines):
                candidate = lines[start_idx + j].strip().upper()
                if _RX9.fullmatch(candidate):
                    return candidate
        return None

    for i, line in enumerate(lines):
        l = _RX10.sub("", line.upper())  # noqa: E741

        if any(k in l for k in ["FATHER", "GUARDIAN", "LEGALGUARDIAN"]):
            name = find_name(i)
            if name:
                data["father_or_guardian"] = name

        if _RX11.search(line.upper()):
            name = find_name(i)
            if name:
                data["mother"] = name

        clean_line = _RX10.sub("", line.upper())
        if any(kw in clean_line for kw in ["SPOUSE", "SPOUS"]):
            name = find_name(i)
            if name:
                data["spouse"] = name

    return data


def extract_passport(text_front: str, text_rear: str) -> dict:
    """The live endpoint assembly (app.py:5699-5722): front-page info,
    rear-page address/pin over the raw rear text, family members over
    ``splitlines()`` of the rear text."""
    passport_info = extract_passport_info(text_front)
    address, pin = extract_address_and_pin(text_rear)
    lines_rear = text_rear.splitlines()
    family_info = extract_family_members(lines_rear)
    return {
        "passport_info": passport_info,
        "address_info": {"address": address, "pin": pin},
        "family_info": family_info,
    }
