"""Mutation-corpus differential parity: cross-family concatenations,
line shuffles, truncations, and OCR-confusion substitutions, compared
against the reference's own lifted sources.  Catches edge-path
divergences the clean per-family corpus can't reach."""

from __future__ import annotations

import random

import pytest

from ocr_api_spark.kernels import aadhaar, bank, dl, pan, passport
from tests.conftest import run_ref
from tests.gen_texts import corpus

PAIRS = [
    ("extract_pan_data", pan.extract_pan_data),
    ("extract_old_pan_data", pan.extract_old_pan_data),
    ("DigiLockeraadhar", aadhaar.digilocker_aadhaar),
    ("extract_front_page_adahar", aadhaar.extract_front_page_adahar),
    ("extract_front_page_reissue_adahar", aadhaar.extract_front_page_reissue_adahar),
    ("extract_full_page_adahar", aadhaar.extract_full_page_adahar),
    ("extract_both_side_adahar", aadhaar.extract_both_side_adahar),
    ("extract_both_side_reissue_adahar", aadhaar.extract_both_side_reissue_adahar),
    ("extract_bank_data", bank.extract_bank_data),
    ("extract_financial_data", bank.extract_financial_data),
    ("extract_ifsc_code_from_text", bank.extract_ifsc_code_from_text),
    ("extract_dl_info", dl.extract_dl_info),
    ("extract_passport_info", passport.extract_passport_info),
    ("extract_address_and_pin", passport.extract_address_and_pin),
]


def _mutants(n: int = 250) -> list[str]:
    texts = [t for _, t in corpus(7, 40)]
    rng = random.Random(99)
    out = []
    for _ in range(n):
        a, b = rng.choice(texts), rng.choice(texts)
        mode = rng.randint(0, 3)
        if mode == 0:
            out.append(a + "\n" + b)
        elif mode == 1:
            ls = (a + "\n" + b).split("\n")
            rng.shuffle(ls)
            out.append("\n".join(ls))
        elif mode == 2:
            ls = a.split("\n")
            out.append("\n".join(ls[: max(1, rng.randint(0, len(ls)))]))
        else:
            out.append(a.replace(rng.choice("AEIOU"), rng.choice("08|")))
    return out


def outcome(fn, *args):
    try:
        return ("ok", fn(*args))
    except Exception as e:  # noqa: BLE001
        return ("err", type(e).__name__)


@pytest.mark.parametrize("ref_name,ours", PAIRS, ids=[p[0] for p in PAIRS])
def test_mutant_parity(reference_ns, ref_name, ours):
    for text in _mutants():
        ref = outcome(lambda t: run_ref(reference_ns, ref_name, t), text)
        got = outcome(ours, text)
        assert got == ref, f"{ref_name} diverged on mutant:\n{text!r}\nref={ref}\nours={got}"
