"""Deterministic synthetic OCR-text generators for every layout family.

Shared by the differential parity tests, the golden fixtures, and the
synthetic ``pages`` table generator.  Seeded ``random.Random`` only —
no wall-clock anywhere, so every run of every test sees identical inputs.
"""

from __future__ import annotations

import random
import string

FIRST = ["RAHUL", "PRIYA", "AMIT", "SUNITA", "VIKRAM", "ANITA", "RAJESH", "KAVITA", "SURESH", "MEENA"]
LAST = ["SHARMA", "VERMA", "PATEL", "GUPTA", "SINGH", "KUMAR", "REDDY", "IYER", "DAS", "JOSHI"]
CITIES = ["MUMBAI", "DELHI", "PUNE", "JAIPUR", "KOLKATA", "CHENNAI", "NAGPUR", "SURAT", "INDORE", "BHOPAL"]
STATES = ["MAHARASHTRA", "RAJASTHAN", "GUJARAT", "KARNATAKA", "TAMIL NADU", "PUNJAB"]

NOISE_CHARS = string.ascii_uppercase + string.digits + " /,-.:|()"


def rand_name(rng: random.Random) -> str:
    return f"{rng.choice(FIRST)} {rng.choice(LAST)}"


def rand_date(rng: random.Random, sep: str | None = None) -> str:
    sep = sep or rng.choice(["/", "-"])
    return f"{rng.randint(1, 28):02d}{sep}{rng.randint(1, 12):02d}{sep}{rng.randint(1950, 2005)}"


def rand_pan(rng: random.Random, confuse: bool = False) -> str:
    letters = "".join(rng.choice(string.ascii_uppercase) for _ in range(5))
    digits = "".join(rng.choice(string.digits) for _ in range(4))
    if confuse:
        pos = rng.randint(0, 3)
        digits = digits[:pos] + rng.choice("SAT") + digits[pos + 1 :]
    return letters + digits + rng.choice(string.ascii_uppercase)


def rand_aadhaar(rng: random.Random, spaced: bool = True) -> str:
    groups = ["".join(rng.choice(string.digits) for _ in range(4)) for _ in range(3)]
    return (" " if spaced else "").join(groups)


def noise_line(rng: random.Random, max_len: int = 30) -> str:
    return "".join(rng.choice(NOISE_CHARS) for _ in range(rng.randint(1, max_len)))


def pan_new_text(rng: random.Random) -> str:
    lines = [
        "INCOME TAX DEPARTMENT",
        "GOVT. OF INDIA",
        "Permanent Account Number Card",
        rand_pan(rng, confuse=rng.random() < 0.3),
        "Name",
        rand_name(rng),
        "Father's Name",
        rand_name(rng),
        "Date of Birth",
        rand_date(rng),
    ]
    if rng.random() < 0.5:
        lines.insert(rng.randint(0, len(lines)), noise_line(rng))
    return "\n".join(lines)


def pan_old_text(rng: random.Random) -> str:
    variant = rng.random()
    if variant < 0.5:
        lines = [
            "INCOME TAX DEPARTMENT",
            "GOVT OF INDIA",
            rand_name(rng),
            rand_name(rng),
            rand_date(rng),
            rand_pan(rng),
            "Signature",
        ]
    else:
        lines = [
            "INCOME TAX PAN SERVICES",
            rand_name(rng),
            rand_date(rng),
            rand_pan(rng),
        ]
    return "\n".join(lines)


def aadhaar_front_text(rng: random.Random) -> str:
    dob_label = rng.choice(["DOB", "D08", "DB", "D8", "DO", "D0"])
    name = rand_name(rng)
    date = rand_date(rng)
    lines = [
        "Government of India",
        name,
        f"{dob_label}: {date}",
        rng.choice(["MALE", "FEMALE"]),
        rand_aadhaar(rng),
    ]
    return "\n".join(lines)


def aadhaar_full_text(rng: random.Random) -> str:
    name = rand_name(rng)
    pin = f"{rng.randint(110000, 899999)}"
    lines = [
        "Unique Identification Authority of India",
        "Enrolment No 1234/12345/12345",
        "TO",
        name,
        f"S/O {rand_name(rng)}",
        f"{rng.randint(1, 400)} {rng.choice(CITIES)} ROAD",
        f"{rng.choice(CITIES)} {rng.choice(STATES)}",
        f"PIN {pin}",
        f"DOB: {rand_date(rng)}",
        "MALE",
        "Your AADHAAR No",
        rand_aadhaar(rng),
    ]
    return "\n".join(lines)


def aadhaar_both_text(rng: random.Random) -> str:
    name = rand_name(rng)
    date = rand_date(rng)
    pin = f"{rng.randint(110000, 899999)}"
    lines = [
        "Government of India",
        name,
        f"DOB: {date}",
        "MALE",
        rand_aadhaar(rng),
        "ADDRESS",
        f"S/O {rand_name(rng)} {rng.randint(1, 400)}",
        f"{rng.choice(CITIES)} {rng.choice(STATES)}",
        f"PIN {pin}",
        rand_aadhaar(rng),
    ]
    return "\n".join(lines)


def aadhaar_digilocker_text(rng: random.Random) -> str:
    name = rand_name(rng)
    lines = [
        "DigiLocker",
        "Issued Document",
        "Masked Aadhaar Number",
        f"XXXXXXXX{rng.randint(1000, 9999)}",
        "Name",
        name,
        "Date of Birth",
        rand_date(rng),
        "Photo",
        f"C/O {rand_name(rng)}",
        f"{rng.randint(1, 400)} {rng.choice(CITIES)} ROAD",
        f"{rng.choice(CITIES)} {rng.choice(STATES)} {rng.randint(110000, 899999)}",
        "CONFIDENTAL",
    ]
    return "\n".join(lines)


def bank_cheque_text(rng: random.Random) -> str:
    prefix = rng.choice(["SBIN", "ICIC", "HDFC", "UTIB", "KKBK"])
    ifsc = prefix + "0" + "".join(rng.choice(string.digits) for _ in range(6))
    micr = "".join(rng.choice(string.digits) for _ in range(9))
    account = "".join(rng.choice(string.digits) for _ in range(rng.randint(10, 14)))
    name = rand_name(rng).title()
    lines = [
        f"{rng.choice(['STATE BANK OF INDIA', 'ICICI BANK LTD', 'HDFC BANK'])}",
        f"IFSC Code: {ifsc}",
        f"MICR Code : {micr}",
        f"Account Number : {account}",
        f"{name} Or Bearer",
        name,
        "Please sign above",
    ]
    return "\n".join(lines)


def financial_text(rng: random.Random) -> str:
    prefix = rng.choice(["SBIN", "ICIC", "HDFC"])
    ifsc = prefix + "0" + "".join(rng.choice(string.digits) for _ in range(6))
    lines = [
        f"Name: {rand_name(rng).title()}",
        f"IFSC: {ifsc}",
        f"MICR: {''.join(rng.choice(string.digits) for _ in range(9))}",
        f"A/c No {''.join(rng.choice(string.digits) for _ in range(12))}",
    ]
    return "\n".join(lines)


def dl_text(rng: random.Random) -> str:
    state = rng.choice(["MH", "DL", "KA", "RJ", "GJ"])
    dl_no = f"{state}{rng.randint(10, 99)} {rng.randint(2000, 2023)}{rng.randint(1000000, 9999999)}"
    name = rand_name(rng)
    pin = f"{rng.randint(110000, 899999)}"
    lines = [
        "DRIVING LICENCE",
        "THE UNION OF INDIA",
        f"DL No: {dl_no}",
        f"NAME: {name}",
        f"DOB: {rand_date(rng)}",
        f"ADD: {rng.randint(1, 400)} {rng.choice(CITIES)} ROAD",
        f"{rng.choice(CITIES)} {pin}",
        f"VALID TILL: {rand_date(rng)}",
    ]
    return "\n".join(lines)


def passport_front_text(rng: random.Random) -> str:
    surname = rng.choice(LAST)
    given = rng.choice(FIRST)
    num = rng.choice(string.ascii_uppercase) + "".join(rng.choice(string.digits) for _ in range(7))
    d1, d2, d3 = sorted(rand_date(rng, "/") for _ in range(3))
    lines = [
        "REPUBLIC OF INDIA",
        "PASSPORT",
        num,
        "Surname",
        surname,
        "Given Name(s)",
        given,
        f"Date of Birth {d1}",
        f"Date of Issue {d2}",
        f"Date of Expiry {d3}",
        f"P<IND{surname}<<{given.replace(' ', '<')}<<<<<<<<<<<<<<<<",
        f"{num}<4IND{rng.randint(100000, 999999)}<<<<<<<<<<<<<<04",
    ]
    return "\n".join(lines)


def passport_rear_text(rng: random.Random) -> str:
    father = rand_name(rng)
    mother = rand_name(rng)
    spouse = rand_name(rng)
    pin = f"{rng.randint(110000, 899999)}"
    lines = [
        "Name of Father / Legal Guardian",
        father,
        "Name of Mother",
        mother,
        "Name of Spouse",
        spouse,
        "Address",
        f"{rng.randint(1, 400)} {rng.choice(CITIES)} ROAD",
        f"{rng.choice(CITIES)} {rng.choice(STATES)}",
        f"PIN {pin}",
        f"File No {rng.randint(10**9, 10**10 - 1)}",
    ]
    return "\n".join(lines)


def junk_text(rng: random.Random) -> str:
    return "\n".join(noise_line(rng) for _ in range(rng.randint(1, 12)))


GENERATORS = {
    "pan_new": pan_new_text,
    "pan_old": pan_old_text,
    "aadhaar_front": aadhaar_front_text,
    "aadhaar_full": aadhaar_full_text,
    "aadhaar_both": aadhaar_both_text,
    "aadhaar_digilocker": aadhaar_digilocker_text,
    "bank": bank_cheque_text,
    "financial": financial_text,
    "dl": dl_text,
    "passport_front": passport_front_text,
    "passport_rear": passport_rear_text,
    "junk": junk_text,
}


def corpus(seed: int, n_per_family: int) -> list[tuple[str, str]]:
    """Deterministic [(family, text)] corpus across every generator."""
    out = []
    for family, gen in GENERATORS.items():
        rng = random.Random(f"{seed}:{family}")
        for _ in range(n_per_family):
            out.append((family, gen(rng)))
    return out
