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
