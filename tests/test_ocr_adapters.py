"""OCR-engine result adapters (S7-S9): the parsing after the engine
call is real code; engines plug in behind the token-table interface."""

from __future__ import annotations

from ocr_api_spark.kernels.ocr_adapters import (
    paddle_legacy_text,
    paddle_legacy_tokens,
    paddle_predict_text,
    tesseract_tsv_tokens,
)

PADDLE_LEGACY = [
    [
        [[[10, 20], [110, 20], [110, 40], [10, 40]], ("1234 5678 9012", 0.98)],
        [[[10, 50], [60, 50], [60, 70], [10, 70]], ("hello", 0.8)],
    ]
]

TSV = (
    "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext\n"
    "1\t1\t0\t0\t0\t0\t0\t0\t640\t480\t-1\t\n"
    "5\t1\t1\t1\t1\t1\t10\t20\t100\t20\t96.5\tRAHUL\n"
    "5\t1\t1\t1\t1\t2\t120\t20\t90\t20\t91.0\tSHARMA\n"
    "5\t1\t1\t1\t2\t1\t10\t50\t40\t20\t-1\t \n"
)


def test_paddle_legacy_shapes():
    toks = paddle_legacy_tokens(PADDLE_LEGACY)
    assert toks[0] == ("1234 5678 9012", 0.98, [[10, 20], [110, 20], [110, 40], [10, 40]])
    # the per-endpoint join quirk: '\n' at app.py:2167, ' ' at app.py:1963
    assert paddle_legacy_text(PADDLE_LEGACY) == "1234 5678 9012\nhello"
    assert paddle_legacy_text(PADDLE_LEGACY, " ") == "1234 5678 9012 hello"
    assert paddle_legacy_tokens(None) == [] and paddle_legacy_text([]) == ""


def test_paddle_predict_text():
    assert paddle_predict_text([{"rec_texts": ["a", "b"]}]) == "a\nb"
    assert paddle_predict_text([]) == "" and paddle_predict_text([{}]) == ""


def test_tesseract_tsv_word_rows_only():
    toks = tesseract_tsv_tokens(TSV)
    assert [t[0] for t in toks] == ["RAHUL", "SHARMA"]
    assert toks[0][1] == 0.965  # percent -> [0,1]
    assert toks[0][2] == [[10, 20], [110, 20], [110, 40], [10, 40]]
    assert tesseract_tsv_tokens("") == []
    assert tesseract_tsv_tokens("bogus\theader\nrow\t1") == []


def test_adapters_compose_with_mask_and_reading_order():
    """Engine output → token triples → I11 masking + I13 ordering, the
    same operators the Spark plan runs."""
    from ocr_api_spark.kernels.masking import (
        mask_aadhaar_regions,
        order_tokens_reading,
        tokens_to_text,
    )

    toks = paddle_legacy_tokens(PADDLE_LEGACY)
    regions = mask_aadhaar_regions(toks, 480, 640)
    assert len(regions) == 1 and regions[0]["x_min"] == 10
    ordered = order_tokens_reading(tesseract_tsv_tokens(TSV))
    assert tokens_to_text(ordered) == "RAHUL\nSHARMA"


def test_tesseract_subprocess_wiring_injected():
    """adapter ↔ subprocess seam without the binary: the runner gets the
    tsv argv and REAL PNG bytes on stdin; its TSV output flows through
    tesseract_tsv_tokens unchanged."""
    import numpy as np

    from ocr_api_spark.kernels.ocr_adapters import (
        tesseract_image_to_data,
        tesseract_osd_output,
        tesseract_tsv_tokens,
    )
    from ocr_api_spark.kernels.png import decode_png

    calls = []
    canned = (
        "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\t"
        "left\ttop\twidth\theight\tconf\ttext\n"
        "5\t1\t1\t1\t1\t1\t10\t20\t30\t12\t96.5\tHELLO\n"
    )

    def fake_run(argv, inp):
        calls.append((argv, inp))
        return canned.encode()

    img = np.full((8, 8), 255, dtype=np.uint8)
    tsv = tesseract_image_to_data(img, run=fake_run)
    assert calls[0][0] == ["tesseract", "stdin", "stdout", "tsv"]
    # stdin carried a decodable PNG of the exact pixels
    np.testing.assert_array_equal(decode_png(calls[0][1]), img)
    assert tesseract_tsv_tokens(tsv) == [
        ("HELLO", 0.965, [[10, 20], [40, 20], [40, 32], [10, 32]])
    ]

    def fake_osd(argv, inp):
        calls.append((argv, inp))
        return b"Page number: 0\nOrientation in degrees: 90\nRotate: 270\n"

    from ocr_api_spark.kernels.image import parse_osd_rotate

    out = tesseract_osd_output(img, run=fake_osd)
    assert calls[1][0] == ["tesseract", "stdin", "stdout", "--psm", "0"]
    assert parse_osd_rotate(out) == 270


def test_tesseract_live_smoke_if_present():
    """Runs the REAL binary when the environment has one (skips here);
    the adapter must parse whatever it prints without raising."""
    import numpy as np
    import pytest

    from ocr_api_spark.kernels.ocr_adapters import (
        tesseract_available,
        tesseract_image_to_data,
        tesseract_tsv_tokens,
    )

    if not tesseract_available():
        pytest.skip("tesseract binary not installed in this environment")
    img = np.full((60, 200), 255, dtype=np.uint8)
    img[20:40, 10:50] = 0  # a black block: output may be empty, must parse
    tokens = tesseract_tsv_tokens(tesseract_image_to_data(img))
    assert isinstance(tokens, list)
