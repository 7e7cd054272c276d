"""Signature-geometry kernel tests on synthetic arrays."""

from __future__ import annotations

import numpy as np

from ocr_api_spark.kernels import signature


def white_canvas(h=200, w=400):
    return np.full((h, w, 3), 255, dtype=np.uint8)


def test_otsu_bimodal():
    gray = np.concatenate([np.full(500, 30, np.uint8), np.full(500, 220, np.uint8)])
    t = signature.otsu_threshold(gray.reshape(20, 50))
    assert 30 <= t < 220


def test_background_white_verdicts():
    img = white_canvas()
    img[90:110, 100:300] = 20  # dark mark in the CENTER, borders clean
    assert signature.is_background_white(img)

    noisy = white_canvas()
    rng = np.random.RandomState(0)
    noisy[:, :, :] = rng.randint(0, 255, noisy.shape, dtype=np.uint8)  # busy everywhere
    assert not signature.is_background_white(noisy)

    dark = np.full((200, 400, 3), 40, dtype=np.uint8)
    assert not signature.is_background_white(dark)  # mean below threshold


def test_straight_line_vs_blob():
    line = white_canvas()
    line[96:104, 25:375] = 0  # 8px x 350px stroke: 4x-expanded ROI is
    # 32 rows -> spread 0.25 < 0.3, aspect 350/32 > 10, no touch
    assert signature.is_straight_line_signature(line)

    blob = white_canvas()
    ys, xs = np.mgrid[0:200, 0:400]
    blob[((ys - 100) ** 2 / 900 + (xs - 200) ** 2 / 8000) < 1] = 0  # fat ellipse
    assert not signature.is_straight_line_signature(blob)


def test_angle_and_horizontal():
    horiz = white_canvas()
    horiz[98:102, 50:350] = 0
    assert signature.is_signature_horizontal(horiz)

    vert = white_canvas(400, 200)
    vert[50:350, 98:102] = 0
    assert not signature.is_signature_horizontal(vert)


def test_rotate_to_horizontal():
    tall = white_canvas(400, 200)
    out = signature.rotate_image_to_horizontal(tall)
    assert out.shape[:2] == (200, 400)
    wide = white_canvas(200, 400)
    assert signature.rotate_image_to_horizontal(wide) is wide


def test_classify_signature_dict():
    img = white_canvas()
    img[96:104, 25:375] = 0
    out = signature.classify_signature(img)
    assert out == {
        "is_background_white": True,
        "is_horizontal": True,
        "needs_rotation": False,
        "is_straight_line": True,
    }
