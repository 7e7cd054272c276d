"""Baseline JPEG codec tests (kernels/jpeg.py): encode→decode
round-trips over every structural path (gray/color, 4:4:4/4:2:0,
restart intervals, odd dimensions), near-exactness at quality 100,
marker robustness, and the Spark decode path."""

from __future__ import annotations

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
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1), "non-baseline"),
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
