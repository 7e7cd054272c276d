"""Image-preprocessing kernel tests (I1-I6, I12 + OSD gate).

Two layers, mirroring tests/test_signature.py:
- algebraic properties of each primitive (identities, invariants,
  exact small-case semantics derived from the cv2 conventions the
  kernels implement);
- golden md5 digests over a fixed seeded input, pinning every chain's
  byte-exact output against refactors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ocr_api_spark.kernels import image as im


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def gray(rgb):
    return im.rgb_to_gray(rgb)


# --- grayscale ---------------------------------------------------------------


def test_gray_matches_float_formula_within_one(rgb):
    g = im.rgb_to_gray(rgb)
    ref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.abs(g.astype(np.float64) - ref).max() <= 1.0


def test_gray_extremes_and_bgr_swap(rgb):
    assert im.rgb_to_gray(np.full((4, 4, 3), 255, np.uint8)).min() == 255
    assert im.rgb_to_gray(np.zeros((4, 4, 3), np.uint8)).max() == 0
    # bgr_to_gray(img) == rgb_to_gray(channel-reversed img)
    assert np.array_equal(im.bgr_to_gray(rgb), im.rgb_to_gray(rgb[..., ::-1]))


# --- resize ------------------------------------------------------------------


def test_resize_identity_is_exact(gray):
    assert np.array_equal(im.resize_cubic(gray, dsize=(60, 40)), gray)


def test_resize_constant_stays_constant():
    const = np.full((16, 24), 88, np.uint8)
    out = im.resize_cubic(const, fx=2.0, fy=2.0)
    assert out.shape == (32, 48)
    assert np.unique(out).tolist() == [88]


def test_upscale_dims():
    img = np.zeros((10, 20), np.uint8)
    assert im.upscale_image(img, 2.0).shape == (20, 40)
    assert im.resize_cubic(img, fx=1.5, fy=1.5).shape == (15, 30)


# --- blur / threshold / dilate -------------------------------------------------


def test_gaussian_blur_small_kernel_semantics():
    # sigma<=0, ksize 3 -> cv2's fixed [0.25, 0.5, 0.25]
    img = np.zeros((5, 5), np.uint8)
    img[2, 2] = 255
    out = im.gaussian_blur(img, (3, 3), 0)
    # center = 255 * 0.5 * 0.5
    assert out[2, 2] == round(255 * 0.25)
    assert out[2, 1] == round(255 * 0.5 * 0.25)
    assert out[1, 1] == round(255 * 0.25 * 0.25)
    const = np.full((8, 8), 137, np.uint8)
    assert np.array_equal(im.gaussian_blur(const, (3, 3), 0), const)


def test_gaussian_auto_ksize_from_sigma():
    # sigma=1.0 on 8U -> ksize 7 (cvRound(1*3)*2+1); kernel normalized
    k = im.gaussian_kernel_1d(im._auto_ksize(1.0), 1.0)
    assert len(k) == 7
    assert abs(k.sum() - 1.0) < 1e-12


def test_adaptive_threshold_binary_and_uniform():
    out = im.adaptive_threshold_gaussian(np.full((20, 20), 90, np.uint8))
    assert set(np.unique(out)) == {255}  # src > src - C everywhere
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    vals = set(np.unique(im.adaptive_threshold_gaussian(noisy)))
    assert vals <= {0, 255} and vals == {0, 255}


def test_dilate_identity_and_3x3():
    img = np.zeros((7, 7), np.uint8)
    img[3, 3] = 200
    assert np.array_equal(im.dilate(img, np.ones((1, 1), np.uint8)), img)
    out = im.dilate(img, np.ones((3, 3), np.uint8))
    assert out[2:5, 2:5].min() == 200 and out[0, 0] == 0


# --- CLAHE ---------------------------------------------------------------------


def test_clahe_uniform_input_gives_uniform_output():
    out = im.clahe(np.full((32, 32), 137, np.uint8))
    assert len(np.unique(out)) == 1


def test_clahe_rejects_color():
    with pytest.raises(ValueError):
        im.clahe(np.zeros((8, 8, 3), np.uint8))


def test_clahe_nondivisible_shape_preserved(gray):
    out = im.clahe(gray[:37, :53])
    assert out.shape == (37, 53)


def test_clahe_stretches_low_contrast():
    rng = np.random.default_rng(11)
    low = (120 + rng.integers(0, 16, (64, 64))).astype(np.uint8)  # 16-level band
    out = im.clahe(low)
    assert out.max() - out.min() > low.max() - low.min()  # contrast expanded


# --- rotation -------------------------------------------------------------------


def test_rotate_zero_is_identity(gray):
    assert np.array_equal(im.rotate_image(gray, 0), gray)
    assert im.correct_rotation(gray, 0) is gray


def test_rotate_90_even_dims_exact(gray):
    """Even dims + the reference's integer center (w//2, h//2) shift the
    content one pixel and leave a white fill row — formula-exact."""
    r90 = im.rotate_image(gray, 90)
    assert r90.shape == (60, 40)
    assert np.all(r90[0] == 255)
    assert np.array_equal(r90[1:], np.rot90(gray)[:-1])


def test_rotate_180_even_dims_exact(gray):
    r180 = im.rotate_image(gray, 180)
    assert np.all(r180[0] == 255) and np.all(r180[:, 0] == 255)
    assert np.array_equal(r180[1:, 1:], gray[::-1, ::-1][:-1, :-1])


def test_correct_rotation_undoes_osd_angle(gray):
    # OSD says "rotated 90" -> correct_rotation rotates by -90
    out = im.correct_rotation(gray, 90)
    assert out.shape == (60, 40)
    assert np.array_equal(out, im.rotate_image(gray, -90))


def test_rotate_expands_canvas_45():
    out = im.rotate_image(np.zeros((40, 60), np.uint8), 45)
    s2 = np.sqrt(2) / 2
    assert out.shape == (int(40 * s2 + 60 * s2), int(40 * s2 + 60 * s2))
    assert out[0, 0] == 255  # white border fill


# --- alpha flatten ---------------------------------------------------------------


def test_alpha_flatten_formula(rgb):
    rng = np.random.default_rng(5)
    bgra = rng.integers(0, 256, (10, 10, 4), dtype=np.uint8)
    a = bgra[:, :, 3:4] / 255.0
    expected = (bgra[:, :, :3] * a + 255 * (1 - a)).astype(np.uint8)
    assert np.array_equal(im.alpha_flatten(bgra), expected)


def test_alpha_flatten_extremes():
    opaque = np.dstack([np.full((4, 4, 3), 10, np.uint8), np.full((4, 4), 255, np.uint8)])
    transparent = np.dstack([np.full((4, 4, 3), 10, np.uint8), np.zeros((4, 4), np.uint8)])
    assert np.array_equal(im.alpha_flatten(opaque), np.full((4, 4, 3), 10, np.uint8))
    assert np.array_equal(im.alpha_flatten(transparent), np.full((4, 4, 3), 255, np.uint8))
    three = np.zeros((4, 4, 3), np.uint8)
    assert im.alpha_flatten(three) is three  # no alpha -> passthrough


# --- OSD gate ---------------------------------------------------------------------


def test_parse_osd_rotate():
    osd = "Page number: 0\nOrientation in degrees: 270\nRotate: 90\nOrientation confidence: 1.8"
    assert im.parse_osd_rotate(osd) == 90
    assert im.parse_osd_rotate("no angle here") == 0
    assert im.parse_osd_rotate(None) == 0
    assert im.parse_osd_rotate("Rotate: garbage") == 0


def test_osd_retry_cascade(gray):
    # success on first try: image unchanged
    img, angle = im.osd_angle_with_retry(gray, lambda _: "Rotate: 180")
    assert angle == 180 and img is gray

    # first raises, second succeeds: the PREPROCESSED image flows on
    calls = []

    def flaky(x):
        calls.append(x.shape)
        if len(calls) == 1:
            raise im.OsdError("boom")
        return "Rotate: 90"

    img2, angle2 = im.osd_angle_with_retry(gray, flaky)
    assert angle2 == 90
    assert img2.shape == (80, 120)  # h<800 -> preprocess_for_osd upscaled ×2

    # both raise: default 0, preprocessed image
    img3, angle3 = im.osd_angle_with_retry(gray, _raise_always)
    assert angle3 == 0 and img3.shape == (80, 120)


def _raise_always(_):
    raise im.OsdError("always")


# --- chains -------------------------------------------------------------------------


def test_preprocess_image_chain(rgb):
    out = im.preprocess_image(rgb)
    assert out.shape == (60, 90)  # ×1.5
    assert set(np.unique(out)) <= {0, 255}


def test_enhance_contrast_and_sharpen_shape(rgb):
    out = im.enhance_contrast_and_sharpen(rgb[:, :, ::-1].copy())
    assert out.shape == (40, 60, 3)
    # unsharp: all three channels identical (gray pipeline)
    assert np.array_equal(out[..., 0], out[..., 1])


def test_preprocess_for_osd_small_upscales(gray):
    assert im.preprocess_for_osd(gray).shape == (80, 120)
    big = np.zeros((800, 64), np.uint8)
    assert im.preprocess_for_osd(big).shape == (800, 64)


def test_preprocess_for_osd_color_quirk(rgb):
    # reference passes the color image straight to CLAHE -> cv2 error;
    # exception parity
    with pytest.raises(ValueError):
        im.preprocess_for_osd(rgb)


# --- golden digests (regression pins over the seed-7 input) -----------------------

_GOLDEN = {
    "gray": "56a855b78933c5884b2d9abec2f55797",
    # regenerated when adaptive_threshold_gaussian adopted cv2's true
    # border mode (REPLICATE) + cvCeil(C)
    "preprocess_image": "69b9e2814e467999742f40cabab03b9d",
    "enhance": "a724f030b3fb13ac20fde273caa2cffa",
    "osd": "95b43a5487cb0cda460ddf9cf22962a3",
    "rot90": "4a7111fe4aa4e45472fce62fbe0a7dcd",
    "clahe": "f7cd64eaab10b9a41e11c51ed2825b52",
    "blur_sigma1": "7be85bd12fa776a4ed23aaf6143872f0",
    "cubic_1_5x": "bbdeb9e2a5479cf1d3c8b8009a6d8ae9",
}


def _md5(arr: np.ndarray) -> str:
    return hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest()


def test_golden_digests(rgb, gray):
    assert _md5(gray) == _GOLDEN["gray"]
    assert _md5(im.preprocess_image(rgb)) == _GOLDEN["preprocess_image"]
    assert _md5(im.enhance_contrast_and_sharpen(rgb[:, :, ::-1].copy())) == _GOLDEN["enhance"]
    assert _md5(im.preprocess_for_osd(gray)) == _GOLDEN["osd"]
    assert _md5(im.rotate_image(gray, 90)) == _GOLDEN["rot90"]
    assert _md5(im.clahe(gray)) == _GOLDEN["clahe"]
    assert _md5(im.gaussian_blur(gray, (0, 0), 1.0)) == _GOLDEN["blur_sigma1"]
    assert _md5(im.resize_cubic(gray, fx=1.5, fy=1.5)) == _GOLDEN["cubic_1_5x"]


def test_erode_open_and_vertical_line_removal():
    # erode of an isolated bright pixel under a 3x3 kernel removes it
    img = np.zeros((9, 9), np.uint8)
    img[4, 4] = 255
    assert im.erode(img, np.ones((3, 3), np.uint8)).max() == 0
    # open keeps structures that contain the kernel, drops smaller ones
    img2 = np.zeros((40, 40), np.uint8)
    img2[5:35, 10] = 255  # 30-px vertical rule
    img2[20, 20:24] = 255  # short horizontal mark
    opened = im.morph_open(img2, np.ones((30, 1), np.uint8))
    assert opened[:, 10].max() == 255 and opened[20, 20:24].max() == 0
    # remove_vertical_lines: the rule disappears, the mark stays
    mask = img2 > 0
    cleaned = im.remove_vertical_lines(mask, 30)
    assert cleaned.dtype == bool
    assert not cleaned[:, 10].any()
    assert cleaned[20, 20:24].all()


def test_gray_equal_channel_fast_path_exact():
    """r6: the equal-channel shortcut in rgb_to_gray must equal the
    fixed-point weighted sum bit-for-bit (weights sum to 2^14, so
    (v*16384 + 8192) >> 14 == v for every uint8 v — proven here by
    brute force over all 256 values, plus a mixed-channel row that must
    NOT take the shortcut)."""
    import numpy as np

    from ocr_api_spark.kernels.image import _B2Y, _G2Y, _R2Y, _YUV_SHIFT, bgr_to_gray, rgb_to_gray

    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rep = np.repeat(v[..., None], 3, axis=2)
    formula = (
        (v.astype(np.int64) * _R2Y + v.astype(np.int64) * _G2Y + v.astype(np.int64) * _B2Y + (1 << (_YUV_SHIFT - 1)))
        >> _YUV_SHIFT
    ).astype(np.uint8)
    assert np.array_equal(rgb_to_gray(rep), formula)
    assert np.array_equal(rgb_to_gray(rep), v)
    assert np.array_equal(bgr_to_gray(rep), v)
    mixed = rep.copy()
    mixed[0, 0, 1] = 255  # one unequal pixel: the full formula must run
    r, g, b = (mixed[..., i].astype(np.int64) for i in range(3))
    full = ((r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_YUV_SHIFT - 1))) >> _YUV_SHIFT).astype(np.uint8)
    assert np.array_equal(rgb_to_gray(mixed), full)
