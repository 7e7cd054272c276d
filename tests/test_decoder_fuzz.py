"""Poison-pill resistance for the untrusted-byte decoders: random
byte corruption of valid payloads must either still decode or raise
the module's own error type — never an IndexError/ValueError/
OverflowError that would fail a whole Spark task through _Decoder or
the PDF branch.  Deterministic seeds; 200 mutations per format."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_api_spark.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg
from ocr_api_spark.kernels.png import PngError, decode_png, encode_png
from ocr_api_spark.sources.pdftext import MiniPdfError, parse_pdf, pdf_from_text


def _img(rng):
    return rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "name,make,decode,err",
    [
        ("jpeg_baseline", lambda r: encode_jpeg(_img(r), 85), decode_jpeg, JpegError),
        ("jpeg_progressive", lambda r: encode_jpeg(_img(r), 85, progressive=True), decode_jpeg, JpegError),
        ("jpeg_420_rst", lambda r: encode_jpeg(_img(r), 85, subsample=True, restart_interval=2), decode_jpeg, JpegError),
        ("png", lambda r: encode_png(_img(r), filter_types=4), decode_png, PngError),
        ("png_interlaced", lambda r: encode_png(_img(r), interlace=True), decode_png, PngError),
        ("pdf_flate", lambda r: pdf_from_text("hello world this is a test doc with words", compress=True), parse_pdf, MiniPdfError),
        ("pdf_plain", lambda r: pdf_from_text("hello world this is a test doc with words"), parse_pdf, MiniPdfError),
    ],
)
def test_corruption_never_escapes_module_error(name, make, decode, err):
    rng = np.random.default_rng(hash(name) % 2**32)
    data = make(rng)
    escaped = []
    for trial in range(200):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            decode(bytes(b))
        except err:
            pass
        except Exception as e:  # noqa: BLE001 - the point of the test
            escaped.append((trial, type(e).__name__, str(e)[:60]))
    assert not escaped, escaped[:5]


def test_truncation_never_escapes():
    rng = np.random.default_rng(5)
    cases = [
        (encode_jpeg(_img(rng), 85, progressive=True), decode_jpeg, JpegError),
        (encode_png(_img(rng), interlace=True), decode_png, PngError),
        (pdf_from_text("some words here", compress=True), parse_pdf, MiniPdfError),
    ]
    for data, decode, err in cases:
        for cut in range(1, len(data), max(1, len(data) // 60)):
            try:
                decode(data[:cut])
            except err:
                pass
