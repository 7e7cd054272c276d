"""Pure-numpy PNG codec tests: encode→decode round-trips across every
row filter type, hand-built palette / gray+alpha images, and the
PDF-predictor unfilter entry point."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocr_api_spark.kernels.png import (
    PngError,
    decode_png,
    encode_png,
    unfilter_scanlines,
)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _png(width, height, depth, color_type, raw_rows: bytes, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_rows))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(13, 17), (9, 11, 3), (6, 8, 4), (1, 1), (2, 300, 3)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(shape, ftype):
    rng = np.random.default_rng(zlib.crc32(repr((shape, ftype)).encode()))
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_types=ftype))
    assert out.shape == arr.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_mixed_filters_per_row():
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, (25, 7, 3), dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_types=[i % 5 for i in range(25)]))
    np.testing.assert_array_equal(out, arr)


def test_gradient_image_paeth():
    # smooth gradients are where Average/Paeth predictions actually differ
    y, x = np.mgrid[0:40, 0:60]
    arr = ((x + y) % 256).astype(np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(arr, filter_types=4)), arr)


def test_palette_decode():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    rows = b"".join(b"\x00" + r.tobytes() for r in idx)
    png = _png(4, 2, 8, 3, rows, extra=_chunk(b"PLTE", pal.tobytes()))
    out = decode_png(png)
    assert out.shape == (2, 4, 3)
    # palette entries are RGB; decode returns BGR
    np.testing.assert_array_equal(out[0, 0], pal[0][::-1])
    np.testing.assert_array_equal(out[1, 3], pal[0][::-1])
    np.testing.assert_array_equal(out[0, 3], pal[3][::-1])


def test_gray_alpha_expands_to_bgra():
    ga = np.array([[[10, 200], [20, 100]]], dtype=np.uint8)  # 1x2, gray+alpha
    rows = b"\x00" + ga.reshape(1, -1).tobytes()
    out = decode_png(_png(2, 1, 8, 4, rows))
    assert out.shape == (1, 2, 4)
    assert tuple(out[0, 0]) == (10, 10, 10, 200)
    assert tuple(out[0, 1]) == (20, 20, 20, 100)


def test_multiple_idat_chunks_concatenate():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rows = b"".join(b"\x00" + r.tobytes() for r in arr)
    z = zlib.compress(rows)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[: len(z) // 2])
        + _chunk(b"IDAT", z[len(z) // 2 :])
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), arr)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda png: b"NOTAPNG" + png[7:],  # bad signature
        lambda png: png[:40],  # truncated
        lambda png: png.replace(b"IDAT", b"JUNK", 1),  # missing IDAT
    ],
)
def test_malformed_raises_pngerror(mutate):
    arr = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(PngError):
        decode_png(mutate(encode_png(arr)))


def test_1bit_gray_document_scan():
    """1-bit gray: the classic scanned-document PNG.  10 px wide -> 2
    packed bytes per row + filter byte; bits expand to 0/255."""
    #      row bits: 1010101010 ; 0000011111  (MSB first, padded)
    rows = b"\x00\xaa\x80" + b"\x00\x07\xc0"
    out = decode_png(_png(10, 2, 1, 0, rows))
    assert out.shape == (2, 10)
    np.testing.assert_array_equal(out[0], [255, 0] * 5)
    np.testing.assert_array_equal(out[1], [0] * 5 + [255] * 5)


def test_2bit_and_4bit_gray_scaling():
    # 2-bit: values 0..3 scale to 0/85/170/255
    rows = b"\x00" + bytes([0b00011011])  # samples 0,1,2,3
    np.testing.assert_array_equal(decode_png(_png(4, 1, 2, 0, rows))[0], [0, 85, 170, 255])
    # 4-bit: 0..15 scale by 17
    rows = b"\x00" + bytes([0x0F, 0x80])  # samples 0,15,8
    np.testing.assert_array_equal(decode_png(_png(3, 1, 4, 0, rows))[0], [0, 255, 136])


def test_4bit_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    rows = b"\x00" + bytes([0x01, 0x20])  # indices 0,1,2 (4-bit, padded)
    out = decode_png(_png(3, 1, 4, 3, rows, extra=_chunk(b"PLTE", pal.tobytes())))
    assert out.shape == (1, 3, 3)
    np.testing.assert_array_equal(out[0, 0], pal[0][::-1])  # BGR
    np.testing.assert_array_equal(out[0, 2], pal[2][::-1])


def test_1bit_up_filter_rows():
    # Up filter on packed rows: second row = XOR-free byte add of deltas
    r1 = bytes([0b10100000])
    r2_delta = bytes([(0b11110000 - 0b10100000) & 0xFF])
    rows = b"\x00" + r1 + b"\x02" + r2_delta
    out = decode_png(_png(4, 2, 1, 0, rows))
    np.testing.assert_array_equal(out[0], [255, 0, 255, 0])
    np.testing.assert_array_equal(out[1], [255, 255, 255, 255])


def test_sub_byte_rgb_rejected():
    rows = b"\x00" + b"\x00" * 8
    with pytest.raises(PngError, match="sub-byte"):
        decode_png(_png(2, 1, 4, 2, rows))
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_png(4, 1, 3, 0, rows))  # depth 3 is not a PNG depth


def test_16bit_gray_via_raw_stream():
    # 4x1 16-bit gray: samples big-endian; high byte survives
    samples = struct.pack(">4H", 0x0102, 0xFF00, 0x8040, 0x0001)
    out = decode_png(_png(4, 1, 16, 0, b"\x00" + samples))
    np.testing.assert_array_equal(out, np.array([[1, 255, 128, 0]], dtype=np.uint8))


def test_unfilter_scanlines_direct_up_predictor():
    # the PDF /Predictor 12 path: rows of deltas vs the previous row
    base = np.array([10, 20, 30, 40], dtype=np.uint8)
    row2 = np.array([15, 25, 35, 45], dtype=np.uint8)
    filtered = b"\x02" + base.tobytes() + b"\x02" + ((row2 - base) & 0xFF).tobytes()
    out = unfilter_scanlines(filtered, row_bytes=4, bpp=1)
    assert out == base.tobytes() + row2.tobytes()


def test_unfilter_rejects_bad_stride():
    with pytest.raises(PngError):
        unfilter_scanlines(b"\x00\x01\x02", row_bytes=4, bpp=1)


@pytest.mark.parametrize("shape", [(13, 17), (9, 11, 3), (6, 8, 4), (1, 1), (8, 8), (16, 16, 3)])
@pytest.mark.parametrize("ftype", [0, 2, 4])
def test_adam7_interlace_roundtrip(shape, ftype):
    rng = np.random.default_rng(zlib.crc32(repr((shape, ftype, "i")).encode()))
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_png(arr, filter_types=ftype, interlace=True)
    # IHDR interlace flag set
    assert data[8 + 8 + 12] == 1
    out = decode_png(data)
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_16bit_keeps_high_byte():
    rng = np.random.default_rng(44)
    hi = rng.integers(0, 256, (7, 9), dtype=np.uint16)
    arr16 = (hi << 8) | rng.integers(0, 256, (7, 9), dtype=np.uint16)
    out = decode_png(encode_png(arr16))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, hi.astype(np.uint8))
    # 16-bit RGB, interlaced, Paeth
    rgb16 = rng.integers(0, 65536, (10, 6, 3), dtype=np.uint16)
    out = decode_png(encode_png(rgb16, filter_types=4, interlace=True))
    np.testing.assert_array_equal(out, (rgb16 >> 8).astype(np.uint8))


def test_16bit_palette_rejected():
    import struct as _s
    ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="16-bit palette"):
        decode_png(png)


def test_sample_byte_cap_rejects_16bit_rgba_bomb():
    """ADVICE r3: a 60M-pixel 16-bit RGBA header passes the raw pixel
    cap but implies ~480 MB of filtered samples; the sample-byte cap
    must reject it before any allocation."""
    import struct
    import zlib

    import pytest

    from ocr_api_spark.kernels.png import PngError, decode_png

    w, h = 10_000, 6_000  # 60M pixels < 64M cap; x4 ch x2 bytes = 480 MB
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 6, 0, 0, 0)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="sample-byte cap"):
        decode_png(png)
