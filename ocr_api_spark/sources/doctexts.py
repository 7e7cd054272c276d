"""Deterministic synthetic document texts with ground truth.

Every generator takes a seeded ``random.Random`` and returns
``(text, truth)`` where ``truth`` carries the claimed-field values a
``claims`` row would hold (the "database values" side of the
reference's match stage, app.py:2180-2186).  Used by the synthetic
``pages``/``claims`` tables, the golden fixtures, and the parity
corpus.  No wall-clock anywhere — identical inputs every run.
"""

from __future__ import annotations

import random
import string

FIRST = ["RAHUL", "PRIYA", "AMIT", "SUNITA", "VIKRAM", "ANITA", "RAJESH", "KAVITA", "SURESH", "MEENA"]
LAST = ["SHARMA", "VERMA", "PATEL", "GUPTA", "SINGH", "KUMAR", "REDDY", "IYER", "DAS", "JOSHI"]
CITIES = ["MUMBAI", "DELHI", "PUNE", "JAIPUR", "KOLKATA", "CHENNAI", "NAGPUR", "SURAT", "INDORE", "BHOPAL"]
STATES = ["MAHARASHTRA", "RAJASTHAN", "GUJARAT", "KARNATAKA", "TAMIL NADU", "PUNJAB"]

NOISE_CHARS = string.ascii_uppercase + string.digits + " /,-.:|()"

WEB_WORDS = (
    "the quick analysis shows that distributed extraction pipelines scale when partition "
    "boundaries align with the natural keys of the corpus and executors avoid repeated model "
    "initialisation while arrow batches amortise serialisation costs across rows"
).split()

# a multi-script word pool for non-en pages: byte-identical extraction
# must survive multi-byte UTF-8 through Arrow/parquet round trips
WEB_WORDS_INTL = (
    "données extraction répartie straße größe 中文网页 内容提取 データ 抽出 "
    "παράδειγμα кириллица содержание émoji🚀 naïve coöperate"
).split()


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


def pan_new(rng: random.Random):
    name = rand_name(rng)
    father = rand_name(rng)
    dob = rand_date(rng)
    pan = rand_pan(rng, confuse=rng.random() < 0.3)
    lines = [
        "INCOME TAX DEPARTMENT",
        "GOVT. OF INDIA",
        "Permanent Account Number Card",
        pan,
        "Name",
        name,
        "Father's Name",
        father,
        "Date of Birth",
        dob,
    ]
    if rng.random() < 0.5:
        lines.insert(rng.randint(0, len(lines)), noise_line(rng))
    truth = {"name": name, "father_name": father, "dob": dob.replace("/", "-"), "pan": pan}
    return "\n".join(lines), truth


def pan_old(rng: random.Random):
    name = rand_name(rng)
    father = rand_name(rng)
    dob = rand_date(rng)
    pan = rand_pan(rng)
    if rng.random() < 0.5:
        lines = ["INCOME TAX DEPARTMENT", "GOVT OF INDIA", name, father, dob, pan, "Signature"]
    else:
        lines = ["INCOME TAX PAN SERVICES", name, dob, pan]
    truth = {"name": name, "father_name": father, "dob": dob.replace("/", "-"), "pan": pan}
    return "\n".join(lines), truth


def aadhaar_front(rng: random.Random):
    dob_label = rng.choice(["DOB", "D08", "DB", "D8", "DO", "D0"])
    name = rand_name(rng)
    date = rand_date(rng)
    number = rand_aadhaar(rng)
    lines = [
        "Government of India",
        name,
        f"{dob_label}: {date}",
        rng.choice(["MALE", "FEMALE"]),
        number,
    ]
    truth = {"name": name, "dob": date.replace("/", "-"), "adharno": number.replace(" ", ""), "address": ""}
    return "\n".join(lines), truth


def aadhaar_full(rng: random.Random):
    name = rand_name(rng)
    date = rand_date(rng)
    number = rand_aadhaar(rng)
    pin = f"{rng.randint(110000, 899999)}"
    addr1 = f"S/O {rand_name(rng)}"
    addr2 = f"{rng.randint(1, 400)} {rng.choice(CITIES)} ROAD"
    addr3 = f"{rng.choice(CITIES)} {rng.choice(STATES)}"
    lines = [
        "Unique Identification Authority of India",
        "Enrolment No 1234/12345/12345",
        "TO",
        name,
        addr1,
        addr2,
        addr3,
        f"PIN {pin}",
        f"DOB: {date}",
        "MALE",
        "Your AADHAAR No",
        number,
    ]
    truth = {
        "name": name,
        "dob": date.replace("/", "-"),
        "adharno": number.replace(" ", ""),
        "address": f"{addr1} {addr2} {addr3} {pin}",
    }
    return "\n".join(lines), truth


def aadhaar_both(rng: random.Random):
    name = rand_name(rng)
    date = rand_date(rng)
    number = rand_aadhaar(rng)
    pin = f"{rng.randint(110000, 899999)}"
    addr1 = f"S/O {rand_name(rng)} {rng.randint(1, 400)}"
    addr2 = f"{rng.choice(CITIES)} {rng.choice(STATES)}"
    lines = [
        "Government of India",
        name,
        f"DOB: {date}",
        "MALE",
        number,
        "ADDRESS",
        addr1,
        addr2,
        f"PIN {pin}",
        number,
    ]
    truth = {
        "name": name,
        "dob": date.replace("/", "-"),
        "adharno": number.replace(" ", ""),
        "address": f"{addr1} {addr2} {pin}",
    }
    return "\n".join(lines), truth


def aadhaar_digilocker(rng: random.Random):
    name = rand_name(rng)
    date = rand_date(rng)
    masked = f"XXXXXXXX{rng.randint(1000, 9999)}"
    addr1 = f"{rng.randint(1, 400)} {rng.choice(CITIES)} ROAD"
    addr2 = f"{rng.choice(CITIES)} {rng.choice(STATES)} {rng.randint(110000, 899999)}"
    lines = [
        "DigiLocker",
        "Issued Document",
        "Masked Aadhaar Number",
        masked,
        "Name",
        name,
        "Date of Birth",
        date,
        "Photo",
        f"C/O {rand_name(rng)}",
        addr1,
        addr2,
        "CONFIDENTAL",
    ]
    truth = {"name": name, "dob": date.replace("/", "-"), "adharno": masked, "address": f"{addr1} {addr2}"}
    return "\n".join(lines), truth


def bank_cheque(rng: random.Random):
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
    truth = {"name": name, "ifsc": ifsc, "micr": micr, "account_number": account}
    return "\n".join(lines), truth


def financial(rng: random.Random):
    prefix = rng.choice(["SBIN", "ICIC", "HDFC"])
    ifsc = prefix + "0" + "".join(rng.choice(string.digits) for _ in range(6))
    micr = "".join(rng.choice(string.digits) for _ in range(9))
    account = "".join(rng.choice(string.digits) for _ in range(12))
    name = rand_name(rng).title()
    lines = [
        f"Name: {name}",
        f"IFSC: {ifsc}",
        f"MICR: {micr}",
        f"A/c No {account}",
    ]
    truth = {"name": name, "ifsc": ifsc, "micr": micr, "account_number": account}
    return "\n".join(lines), truth


def dl(rng: random.Random):
    state = rng.choice(["MH", "DL", "KA", "RJ", "GJ"])
    dl_no = f"{state}{rng.randint(10, 99)} {rng.randint(2000, 2023)}{rng.randint(1000000, 9999999)}"
    name = rand_name(rng)
    pin = f"{rng.randint(110000, 899999)}"
    dob = rand_date(rng)
    lines = [
        "DRIVING LICENCE",
        "THE UNION OF INDIA",
        f"DL No: {dl_no}",
        f"NAME: {name}",
        f"DOB: {dob}",
        f"ADD: {rng.randint(1, 400)} {rng.choice(CITIES)} ROAD",
        f"{rng.choice(CITIES)} {pin}",
        f"VALID TILL: {rand_date(rng)}",
    ]
    truth = {"name": name, "dob": dob, "dl_number": dl_no.replace(" ", ""), "pincode": pin}
    return "\n".join(lines), truth


def passport_front(rng: random.Random):
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
    truth = {"name": f"{given} {surname}", "passport_number": num, "dob": d1}
    return "\n".join(lines), truth


def passport_rear(rng: random.Random):
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
    truth = {"father_name": father, "pincode": pin}
    return "\n".join(lines), truth


def junk(rng: random.Random):
    return "\n".join(noise_line(rng) for _ in range(rng.randint(1, 12))), {}


GENERATORS = {
    "pan_new": pan_new,
    "pan_old": pan_old,
    "aadhaar_front": aadhaar_front,
    "aadhaar_full": aadhaar_full,
    "aadhaar_both": aadhaar_both,
    "aadhaar_digilocker": aadhaar_digilocker,
    "bank": bank_cheque,
    "financial": financial,
    "dl": dl,
    "passport_front": passport_front,
    "passport_rear": passport_rear,
    "junk": junk,
}

# Which extractor branch a family dispatches to in the pipeline.
FAMILY_DOC_TYPE = {
    "pan_new": "pan",
    "pan_old": "pan",
    "aadhaar_front": "aadhaar",
    "aadhaar_full": "aadhaar",
    "aadhaar_both": "aadhaar",
    "aadhaar_digilocker": "aadhaar",
    "bank": "bank",
    "financial": "financial",
    "dl": "dl",
    "passport_front": "passport",
    "passport_rear": "passport",
    "junk": "pan",
}


def web_paragraph(rng: random.Random, n_words: int, intl: bool = False) -> str:
    pool = WEB_WORDS_INTL if intl else WEB_WORDS
    return " ".join(rng.choice(pool) for _ in range(n_words)).capitalize() + "."


def wrap_text_as_page(text: str) -> str:
    """Deterministic chrome wrapper (no RNG): the given text becomes the
    page's article paragraphs surrounded by nav/menu/footer boilerplate.
    Shared by the Spark boilerplate-roundtrip query and its driver-side
    oracle, so both sides build byte-identical HTML."""
    words = [w for w in text.split(" ") if w]
    paras = "".join(
        "<p>" + " ".join(words[i : i + 25]).capitalize() + ".</p>" for i in range(0, len(words), 25)
    )
    nav = "<nav>" + "".join(f'<a href="/{w}">{w}</a> ' for w in words[:6]) + "</nav>"
    menu = '<div class="menu">' + " | ".join(f'<a href="/m{i}">menu</a>' for i in range(5)) + "</div>"
    footer = "<footer>" + "".join(f'<a href="/f{i}">legal</a>' for i in range(4)) + "</footer>"
    title = " ".join(words[:4]).capitalize()
    return (
        f"<html><head><title>{title}</title><script>var x=1;</script></head>"
        f"<body>{nav}{menu}<article><h1>{title}</h1>{paras}</article>{footer}</body></html>"
    )


def web_page_html(rng: random.Random, n_paras: tuple[int, int] = (2, 5), para_words: tuple[int, int] = (20, 60)):
    """A synthetic web page: chrome (nav/menus/footer, high link density)
    wrapping long content paragraphs.  Returns (html, main_text) where
    main_text is the kernel's own boilerplate output — the golden
    extracted text for HTML rows.  Pass bigger ``n_paras``/``para_words``
    for production-shaped (tens-of-KB) pages."""
    from ocr_api_spark.kernels.boilerplate import extract_main_text

    nav = "<nav>" + "".join(f'<a href="/{w}">{w}</a> ' for w in rng.sample(WEB_WORDS, 6)) + "</nav>"
    menu = (
        '<div class="menu">'
        + " | ".join(f'<a href="/m{i}">{rng.choice(WEB_WORDS)}</a>' for i in range(5))
        + "</div>"
    )
    intl = rng.random() < 0.15  # a slice of pages is multi-script
    paras = "".join(
        f"<p>{web_paragraph(rng, rng.randint(*para_words), intl)}</p>" for _ in range(rng.randint(*n_paras))
    )
    footer = "<footer>" + "".join(f'<a href="/f{i}">legal</a>' for i in range(4)) + "</footer>"
    title = web_paragraph(rng, 4)
    html = (
        f"<html><head><title>{title}</title><script>var x=1;</script></head>"
        f"<body>{nav}{menu}<article><h1>{title}</h1>{paras}</article>{footer}</body></html>"
    )
    return html, extract_main_text(html)
