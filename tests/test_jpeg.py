"""Baseline JPEG codec tests (kernels/jpeg.py): encode→decode
round-trips over every structural path (gray/color, 4:4:4/4:2:0,
restart intervals, odd dimensions), near-exactness at quality 100,
marker robustness, and the Spark decode path."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from ocr_api_spark.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def _gradient(h, w, channels=None):
    y, x = np.mgrid[0:h, 0:w]
    if channels is None:
        return ((2 * x + 3 * y) % 256).astype(np.uint8)
    return np.dstack([((x + y) % 256), ((2 * x) % 256), ((3 * y) % 256)]).astype(np.uint8)[
        :, :, :channels
    ]


@pytest.mark.parametrize("shape", [(48, 64), (17, 23), (8, 8), (1, 1), (9, 130)])
def test_gray_roundtrip_psnr(shape):
    img = _gradient(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 35


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("shape", [(48, 64), (17, 23), (31, 33)])
def test_color_roundtrip_psnr(shape, subsample):
    img = _gradient(*shape, channels=3)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert out.shape == img.shape
    assert _psnr(img, out) > (30 if subsample else 35)


def test_flat_image_exact():
    for val in (0, 128, 255):
        img = np.full((24, 40), val, np.uint8)
        assert (decode_jpeg(encode_jpeg(img, quality=85)) == img).all()


def test_quality_100_near_exact():
    img = _gradient(32, 32)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_quality_tradeoff_monotone_size():
    img = np.random.default_rng(5).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_restart_interval_roundtrip():
    img = _gradient(48, 64, channels=3)
    data = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI emitted
    assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
    out = decode_jpeg(data)
    assert _psnr(img, out) > 35


def test_noise_roundtrip_reasonable():
    img = np.random.default_rng(7).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=95))) > 30


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"xx" + d[2:], "SOI"),
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc3", 1), "unsupported SOF"),  # lossless
        # baseline entropy reinterpreted as SOF2: the full-band scan is
        # an illegal progressive DC scan and must fail cleanly
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1), "DC scan"),
        (lambda d: d[:40], None),  # truncated anywhere: some JpegError
    ],
)
def test_malformed_raises(mutate, msg):
    data = encode_jpeg(_gradient(16, 16), quality=80)
    with pytest.raises(JpegError, match=msg):
        decode_jpeg(mutate(data))


def test_decoder_singleton_jpeg_path(tmp_path):
    """JPEG payloads flow through _Decoder like .npy/PNG do."""
    from ocr_api_spark.operators.multimodal import _Decoder

    img = _gradient(20, 30, channels=3)
    arr, kind = _Decoder._try_pixels(encode_jpeg(img, quality=95))
    assert kind == "jpeg" and arr.shape == img.shape
    assert _psnr(img, arr) > 35
    # corrupt JPEG: falls through to (None, None), not an exception
    assert _Decoder._try_pixels(b"\xff\xd8\xff\xe0junk") == (None, None)


def test_spark_image_features_jpeg(tmp_path):
    from ocr_api_spark.operators.multimodal import image_features
    from ocr_api_spark.plans.session import build_session

    session = build_session(app_name="jpeg-tests", master="local[2]", shuffle_partitions=2)
    gray = _gradient(24, 36)
    df = session.createDataFrame(
        [("j1", encode_jpeg(gray, quality=92), "image")],
        "url string, payload binary, payload_kind string",
    )
    row = image_features(df).collect()[0]
    assert row["decode_status"] == "jpeg"
    assert (row["feature"][0], row["feature"][1]) == (24.0, 36.0)


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_decodes_identical_to_baseline(subsample):
    """Same coefficients, different scan order: the progressive stream
    must reconstruct the exact same pixels as the baseline stream."""
    img = _gradient(48, 64, channels=3)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    prog_data = encode_jpeg(img, quality=90, subsample=subsample, progressive=True)
    assert b"\xff\xc2" in prog_data  # SOF2
    assert prog_data.count(b"\xff\xda") == 4  # DC scan + 3 AC band scans
    np.testing.assert_array_equal(decode_jpeg(prog_data), base)


def test_progressive_gray_and_odd_dims():
    for shape in [(8, 8), (17, 23), (40, 56)]:
        img = _gradient(*shape)
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
        np.testing.assert_array_equal(prog, base)


def test_progressive_successive_approximation_hand_stream():
    """Hand-built SOF2 stream exercising the paths our encoder does not
    emit: DC first at Al=1 + DC refinement, AC first at Al=1 + AC
    refinement with correction bits and an EOB run.  Block coefficients
    (zigzag): DC=6, k1=5, k3=-3, k10=1, quant all-ones."""
    import struct
    import zlib  # noqa: F401  (only to mirror test style)

    from ocr_api_spark.kernels.jpeg import (
        AC_LUMA_COUNTS,
        AC_LUMA_SYMBOLS,
        DC_LUMA_COUNTS,
        DC_LUMA_SYMBOLS,
        ZIGZAG,
        _BitWriter,
        _build_huffman_encoder,
        _T,
    )

    dc_enc = _build_huffman_encoder(DC_LUMA_COUNTS, DC_LUMA_SYMBOLS)
    ac_enc = _build_huffman_encoder(AC_LUMA_COUNTS, AC_LUMA_SYMBOLS)

    def scan(body, entropy):
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body + entropy

    # scan 1: DC first, Al=1 -> send 6>>1 = 3 (category 2, bits '11')
    b1 = _BitWriter()
    code, ln = dc_enc[2]
    b1.write(code, ln)
    b1.write(3, 2)
    b1.flush()
    s1 = scan(bytes([1, 1, 0x00, 0, 0, 0x01]), bytes(b1.out))

    # scan 2: DC refinement Ah=1,Al=0 -> one bit: 6 & 1 = 0
    b2 = _BitWriter()
    b2.write(0, 1)
    b2.flush()
    s2 = scan(bytes([1, 1, 0x00, 0, 0, 0x10]), bytes(b2.out))

    # scan 3: AC first, Ss=1,Se=63,Al=1 -> k1: 5//2=2 (run 0, cat 2),
    # k3: -3//2 = -1 (run 1, cat 1), then EOB (k10's 1>>1 == 0)
    b3 = _BitWriter()
    code, ln = ac_enc[0x02]
    b3.write(code, ln)
    b3.write(2, 2)
    code, ln = ac_enc[0x11]
    b3.write(code, ln)
    b3.write(0, 1)  # -1 -> bits 0
    code, ln = ac_enc[0x00]
    b3.write(code, ln)  # EOB
    b3.flush()
    s3 = scan(bytes([1, 1, 0x00, 1, 63, 0x01]), bytes(b3.out))

    # scan 4: AC refinement Ah=1,Al=0: new significant +1 at k10 after 7
    # zero-history coeffs (k2,k4..k9) -> RS 0x71, sign 1, then correction
    # bits for k1 (5&1=1) and k3 (3&1=1) read during the walk; then EOB
    b4 = _BitWriter()
    code, ln = ac_enc[0x71]
    b4.write(code, ln)
    b4.write(1, 1)  # sign: positive
    b4.write(1, 1)  # correction k1
    b4.write(1, 1)  # correction k3
    code, ln = ac_enc[0x00]
    b4.write(code, ln)  # EOB run of 1
    b4.flush()
    s4 = scan(bytes([1, 1, 0x00, 1, 63, 0x10]), bytes(b4.out))

    def dht(cls, tid, counts, symbols):
        body = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    data = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
        + b"\xff\xc2" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([1, 1, 0x11, 0])
        + dht(0, 0, DC_LUMA_COUNTS, DC_LUMA_SYMBOLS)
        + dht(1, 0, AC_LUMA_COUNTS, AC_LUMA_SYMBOLS)
        + s1 + s2 + s3 + s4
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 8)

    # expected: IDCT of the exact coefficient block
    zz = np.zeros(64)
    zz[0], zz[1], zz[3], zz[10] = 6, 5, -3, 1
    blk = np.zeros(64)
    blk[ZIGZAG] = zz
    expect = np.clip(np.round(_T.T @ blk.reshape(8, 8) @ _T + 128.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_adobe_app14_transform_zero_reads_rgb():
    """APP14 'Adobe' transform 0 declares the 3 components are straight
    R,G,B (no YCbCr step) — same entropy data, different color read."""
    import struct

    img = np.dstack(
        [np.full((16, 16), 30, np.uint8), np.full((16, 16), 120, np.uint8),
         np.full((16, 16), 220, np.uint8)]
    )
    data = encode_jpeg(img, quality=95)
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
    tagged = data[:2] + app14 + data[2:]
    ycc = decode_jpeg(data)
    rgb = decode_jpeg(tagged)
    # untagged: our encoder wrote YCbCr, decode round-trips the colors
    assert np.abs(ycc[0, 0].astype(int) - [30, 120, 220]).max() <= 2
    # tagged: the Y,Cb,Cr planes are REINTERPRETED as R,G,B -> BGR flip
    assert not (rgb[0, 0] == ycc[0, 0]).all()
    y_plane = 0.299 * 220 + 0.587 * 120 + 0.114 * 30  # what Y held
    assert abs(int(rgb[0, 0][2]) - round(y_plane)) <= 2  # R = old Y plane


def test_w16_gate_fallback_decodes_identically(monkeypatch):
    """Segments above the per-bit window-table gate decode via the
    shift path; both paths must produce identical pixels."""
    import numpy as np

    from ocr_api_spark.kernels import jpeg as J

    scan = np.random.default_rng(11).integers(0, 256, (64, 96), dtype=np.uint8)
    for progressive in (False, True):
        jb = J.encode_jpeg(scan, quality=80, progressive=progressive)
        fast = J.decode_jpeg(jb)
        monkeypatch.setattr(J, "_W16_MAX_SEGMENT_BYTES", 0)
        slow = J.decode_jpeg(jb)
        monkeypatch.undo()
        assert np.array_equal(fast, slow), progressive


def test_cmyk_roundtrip_flat_exact():
    """Adobe 4-component CMYK (transform 0): flat blocks survive the
    DCT exactly, so decode(encode(cmyk)) equals the documented
    inverted-ink conversion BGR = stored_CMY * stored_K / 255."""
    c, m, y, k = 200, 150, 100, 250
    img = np.dstack([np.full((24, 40), v, np.uint8) for v in (c, m, y, k)])
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == (24, 40, 3)
    expect = [round(y * k / 255.0), round(m * k / 255.0), round(c * k / 255.0)]  # B,G,R
    assert np.abs(out[0, 0].astype(int) - expect).max() <= 1, (out[0, 0], expect)
    assert (out == out[0, 0]).all()


def test_ycck_roundtrip_matches_cmyk():
    """APP14 transform 2 (YCCK): same pixels ride the YCbCr transform
    on the ink channels — decoding must land on the same BGR as the
    raw-CMYK form within DCT rounding."""
    rng = np.random.default_rng(11)
    base = rng.integers(60, 200, (6, 9), dtype=np.uint8)
    img = np.stack(
        [np.kron(base, np.ones((8, 8), np.uint8)) for _ in range(4)], axis=2
    )
    img[:, :, 1] = np.roll(img[:, :, 1], 8, axis=0)
    img[:, :, 3] |= 0x80  # keep K ink light so products stay mid-range
    raw = decode_jpeg(encode_jpeg(img, quality=95))
    ycc = decode_jpeg(encode_jpeg(img, quality=95, ycck=True))
    assert raw.shape == ycc.shape == (48, 72, 3)
    assert np.abs(raw.astype(int) - ycc.astype(int)).max() <= 4


def test_cmyk_gradient_roundtrip_psnr():
    h, w = 33, 47  # non-multiple-of-8 dims
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            ((yy + xx) * 255 // (h + w - 2)).astype(np.uint8),
            np.full((h, w), 230, np.uint8),
        ]
    )
    for ycck in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=92, ycck=ycck))
        c, m, y, k = (img[:, :, i].astype(np.float64) for i in range(4))
        expect = np.clip(
            np.round(np.dstack([y * k, m * k, c * k]) / 255.0), 0, 255
        ).astype(np.uint8)
        assert out.shape == expect.shape
        assert _psnr(expect, out) > 34, ycck


def test_cmyk_progressive_matches_baseline():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_jpeg(img, quality=85, progressive=True))
    np.testing.assert_array_equal(prog, base)


def test_cmyk_without_app14_reads_as_raw_cmyk():
    """No Adobe marker on a 4-component stream → straight CMYK (the
    libjpeg default guess); stripping our APP14 must not change the
    transform-0 result."""
    import struct

    img = np.dstack([np.full((16, 16), v, np.uint8) for v in (180, 90, 60, 240)])
    data = encode_jpeg(img, quality=95)
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
    assert app14 in data
    stripped = data.replace(app14, b"")
    np.testing.assert_array_equal(decode_jpeg(stripped), decode_jpeg(data))
