"""Bank / cheque / financial-document extraction kernels.

Ports of ``extract_financial_data`` (app.py:285-343),
``extract_bank_data`` (app.py:1788-1866), and the IFSC multi-strategy
suite (app.py:4558-4670).  The financial extractor calls the
*effective* ``clean_text`` (app.py:4563 — uppercase/pipe-to-I/strip
punct), which is what the reference executes at runtime once the
module is fully loaded (see SURVEY.md §0.1).
"""

from __future__ import annotations

import re

from ocr_api_spark.kernels.common import clean_text

# r8: precompiled hot-path patterns (module-level, once per worker)
_RX0 = re.compile(r"Name[:\s]+(.+)", re.IGNORECASE)
_RX1 = re.compile(r"\b\d{9}\b")
_RX2 = re.compile(r"\b\d{10,16}\b")
_RX3 = re.compile(r"MICR\s*Code\s*:\s*(\d{9})", re.IGNORECASE)
_RX4 = re.compile(r"[^A-Za-z\s&]+")
_RX5 = re.compile(r"\bon\b", re.IGNORECASE)
_RX6 = re.compile(r"1©SC CODE.*?\}\s*([A-Z][A-Za-z\s]+)", re.IGNORECASE)
_RX7 = re.compile(r"\b[A-Z][a-z]+\s[A-Z][A-Za-z]+(?:\s[A-Z][A-Za-z]+)?\b")
_RX8 = re.compile(r"(Bank|Statement|Account|Branch|Bearer)", re.IGNORECASE)
_RX9 = re.compile(r"\s{2,}")
_RX10 = re.compile(r"Account\s*Number\s*:\s*(\d{8,18})", re.IGNORECASE)
_RX11 = re.compile(r"\b\d{8,18}\b")
_RX12 = re.compile(r"\W")
_RX14 = re.compile(r"[A-Z0-9]{6,13}")
_RX15 = re.compile(r"IFS(?:C|0|O)?[\s\-:=]*[Cc]ode[\s\-:=]*([A-Z0-9\s]{10,20})")
_RX16 = re.compile(r"IFS[C0O][\s\-:=]*([A-Z0-9]{6,13})")
_RX17 = re.compile(r"\b\d{9,18}\b")

BANK_IFSC_PREFIXES = [
    "SBIN", "ICIC", "HDFC", "PUNB", "UTIB", "IBKL", "BARB", "KARB",
    "YESB", "CNRB", "IOBA", "ORBC", "MAHB", "INDB", "SCBL", "HSBC", "BDBL", "KKBK",
]

_RX_NAME_EXCL = re.compile(
    r"(bank|branch|account|code|address|holder|nominee|statement)", re.IGNORECASE
)
_RX_CHEQUE_EXCL = re.compile(r"(Savings|Account|Branch|Code|Bearer)", re.IGNORECASE)
_RX_NAME_STMT = re.compile(
    r"(?:MR\.|MRS\.|ACCOUNT HOLDER|NAME\(S\))\s*([A-Z][A-Za-z\s&]+(?:\s[A-Z][A-Za-z\s&]+)?)",
    re.IGNORECASE,
)
_IFSC_STRICT = re.compile(r"[A-Z]{4}0[A-Z0-9]{6}")
_IFSC_STRICT_B = re.compile(r"\b[A-Z]{4}0[A-Z0-9]{6}\b")

_FINANCIAL_NAME_EXCLUDE = ["address", "w/o", "d/o", "s/o", "pincode", "holder", "nominee"]


def extract_financial_data(text: str) -> dict:
    """app.py:285-343 — labelled name with exclusion list, multi-word
    fallback name, strict IFSC, bare 9-digit MICR, 10-16 digit account."""
    details = {
        "Client Name": None,
        "MICR Code": None,
        "IFSC Code": None,
        "Account Number": None,
    }
    lines = text.split("\n")
    processed_lines = [line.strip() for line in lines if line.strip()]

    for line in processed_lines:
        name_match = _RX0.search(line)
        if name_match:
            potential_name = clean_text(name_match.group(1).strip())
            if not any(word in potential_name.lower() for word in _FINANCIAL_NAME_EXCLUDE):
                details["Client Name"] = potential_name
                break

    if not details["Client Name"]:
        for line in processed_lines:
            if len(line.split()) > 1 and not _RX_NAME_EXCL.search(line):
                details["Client Name"] = clean_text(line)
                break

    for line in processed_lines:
        ifsc_match = _IFSC_STRICT.search(line)
        if ifsc_match:
            details["IFSC Code"] = clean_text(ifsc_match.group(0))
            break

    for line in processed_lines:
        micr_match = _RX1.search(line)
        if micr_match:
            details["MICR Code"] = clean_text(micr_match.group(0))
            break

    for line in processed_lines:
        account_match = _RX2.search(line)
        if account_match:
            details["Account Number"] = clean_text(account_match.group(0))
            break

    return details


def extract_bank_data(text: str) -> dict:
    """app.py:1788-1866 — cheque/bank-statement fields.  Note the
    reference only conditionally adds the ``ocr_account_number`` key."""
    info = {
        "ocr_IFSC": None,
        "ocr_MICR": None,
        "ocr_Account_Holder_Name": None,
    }

    lines = [line.strip() for line in text.split("\n") if line.strip()]
    text = "\n".join(lines)

    ifsc = _IFSC_STRICT_B.search(text)
    if ifsc:
        info["ocr_IFSC"] = ifsc.group(0)

    if not info["ocr_IFSC"]:
        corrected_text = text.replace("8", "B").replace("O", "0")
        ifsc_corrected = _IFSC_STRICT_B.search(corrected_text)
        if ifsc_corrected:
            info["ocr_IFSC"] = ifsc_corrected.group(0)

    micr = _RX3.search(text)
    if micr:
        info["ocr_MICR"] = micr.group(1)

    if not info["ocr_MICR"]:
        micr_fallback = _RX1.search(text)
        if micr_fallback:
            info["ocr_MICR"] = micr_fallback.group(0)

    for i, line in enumerate(lines):
        if "Please sign above" in line or "Payable at" in line:
            for j in range(1, 4):
                if i - j >= 0:
                    potential_name = lines[i - j].strip()
                    if len(potential_name.split()) > 1 and not _RX_CHEQUE_EXCL.search(potential_name):
                        validated_name = _RX4.sub("", potential_name).strip()
                        if validated_name and not _RX5.search(validated_name):
                            info["ocr_Account_Holder_Name"] = validated_name
                            break
            break

    if not info["ocr_Account_Holder_Name"]:
        name_context_match = _RX6.search(text)
        if name_context_match:
            info["ocr_Account_Holder_Name"] = name_context_match.group(1).strip()

    if not info["ocr_Account_Holder_Name"]:
        name_statement = _RX_NAME_STMT.search(text)
        if name_statement:
            info["ocr_Account_Holder_Name"] = name_statement.group(1).strip()

    if not info["ocr_Account_Holder_Name"]:
        name_fallback = _RX7.search(text)
        if name_fallback:
            potential_name = name_fallback.group(0).strip()
            if not _RX8.search(potential_name):
                info["ocr_Account_Holder_Name"] = potential_name

    if info["ocr_Account_Holder_Name"]:
        info["ocr_Account_Holder_Name"] = _RX9.sub(" ", info["ocr_Account_Holder_Name"]).strip()

    account = _RX10.search(text)
    if account:
        info["ocr_account_number"] = account.group(1)

    if not info.get("ocr_account_number"):
        account_fallback = _RX11.search(text)
        if account_fallback:
            info["ocr_account_number"] = account_fallback.group(0)

    return info


# --- IFSC multi-strategy suite (app.py:4558-4656) -------------------------


def normalize_ifsc(code: str) -> str:
    """app.py:4566-4586 — O→0, D→0, |→I confusion repair; slice from a
    known bank prefix to the first space, then re-extract strict."""
    code = code.upper().replace("O", "0").replace("D", "0").replace("|", "I")
    code = code.replace("\u200b", "").replace(":", "").strip()

    for prefix in BANK_IFSC_PREFIXES:
        idx = code.find(prefix)
        if idx != -1:
            sliced = code[idx:].split()[0]
            sliced = _RX12.sub("", sliced)
            match = _IFSC_STRICT.search(sliced)
            if match:
                return match.group()

    match = _IFSC_STRICT.search(code)
    if match:
        return match.group()
    return code


def validate_relaxed_ifsc(code: str) -> bool:
    """app.py:4588-4592 — strict fullmatch, rejecting a literal IFSC prefix."""
    if code.startswith("IFSC"):
        return False
    return bool(_IFSC_STRICT.fullmatch(code))


def extract_ifsc_from_prefix(text: str, bank_prefixes=BANK_IFSC_PREFIXES) -> str | None:
    """app.py:4594-4606 — 11-char slice from a known prefix in repaired text."""
    cleaned_text = text.upper().replace("O", "0").replace("|", "I").replace("\u200b", "")
    for prefix in bank_prefixes:
        idx = cleaned_text.find(prefix)
        if idx != -1:
            candidate = cleaned_text[idx : idx + 11]
            if _IFSC_STRICT.fullmatch(candidate):
                return candidate
    return None


def extract_ifsc_code_from_text(text: str) -> str | None:
    """app.py:4610-4656 — the ordered short-circuit cascade:
    label-line segments → keyword match with prefix patching →
    prefix-preferred valid candidate → prefix slice → None."""
    text = clean_text(text)
    candidates = _RX14.findall(text)
    valid_ifscs = []
    for raw in candidates:
        norm = normalize_ifsc(raw)
        if validate_relaxed_ifsc(norm):
            valid_ifscs.append(norm)

    ifsc_lines = _RX15.findall(text)
    for raw in ifsc_lines:
        parts = re.split(r"\s+", raw)
        for part in parts:
            norm = normalize_ifsc(part)
            if _IFSC_STRICT.fullmatch(norm):
                return norm

    keyword_matches = _RX16.findall(text)
    for match in keyword_matches:
        norm = normalize_ifsc(match)
        if len(norm) <= 8 and norm.startswith("0"):
            for prefix in BANK_IFSC_PREFIXES:
                patched = prefix + norm
                if validate_relaxed_ifsc(patched):
                    return patched
        if validate_relaxed_ifsc(norm):
            return norm

    for prefix in BANK_IFSC_PREFIXES:
        for code in valid_ifscs:
            if code.startswith(prefix):
                return code

    prefix_ifsc = extract_ifsc_from_prefix(text)
    if prefix_ifsc:
        return prefix_ifsc
    return None


def extract_longest_account_number(text: str) -> str | None:
    """app.py:4659-4670 minus the OCR engine: all 9-18 digit runs in the
    (space-joined) token text, longest wins."""
    numbers = _RX17.findall(text)
    if numbers:
        return max(numbers, key=len)
    return None
