"""Signature-geometry kernels (reference I7-I10, app.py:4736-4886).

The reference uses OpenCV (Otsu, morphology, contours, minAreaRect,
PCA, Canny).  This container has no cv2, so these are numpy
re-implementations that keep the reference's *decision structure* and
thresholds; where an exact primitive is cv2-only the stand-in is
documented inline:

- Otsu threshold: exact (histogram between-class variance).
- border-statistics of ``is_background_white``: exact port
  (mean > 110, std < 80, max RGB diff < 35; app.py:4828-4852).
- edge density: Sobel-magnitude density stands in for Canny density
  (same intent: "busy border ⇒ not a clean white background").
- signature angle: PCA over *foreground pixels* stands in for PCA over
  the largest contour's points (app.py:4854-4868) — identical for
  blob-like marks, deterministic.
- straight-line verdict: row-spread/touch/aspect tests (app.py:4783-4806)
  on the axis-aligned foreground crop instead of the rotated
  minAreaRect ROI; the reference's vertical-line removal (1×30
  MORPH_OPEN + subtract, app.py:4741-4744) runs first via
  ``kernels.image.remove_vertical_lines`` (exact morphology).

When cv2 is available the operators can swap in the exact primitives;
the decision thresholds live here either way.
"""

from __future__ import annotations

import math

import numpy as np


def otsu_threshold(gray: np.ndarray) -> int:
    """Exact Otsu: maximize between-class variance over the 256-bin
    histogram (what cv2.THRESH_OTSU computes)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b2 = (mu_t * omega - mu) ** 2 / denom
    return int(np.nanargmax(sigma_b2))


def to_gray(img: np.ndarray) -> np.ndarray:
    """BGR → gray with OpenCV's weights (0.114 B + 0.587 G + 0.299 R)."""
    if img.ndim == 2:
        return img.astype(np.uint8)
    b, g, r = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    return np.clip(0.114 * b + 0.587 * g + 0.299 * r, 0, 255).astype(np.uint8)


def foreground_mask(img: np.ndarray) -> np.ndarray:
    """THRESH_BINARY_INV + OTSU: dark ink on light paper → True."""
    gray = to_gray(img)
    return gray <= otsu_threshold(gray)


def _sobel_edge_density(gray: np.ndarray, mag_thresh: float = 100.0) -> float:
    gx = np.zeros_like(gray, dtype=np.float64)
    gy = np.zeros_like(gray, dtype=np.float64)
    g = gray.astype(np.float64)
    gx[:, 1:-1] = g[:, 2:] - g[:, :-2]
    gy[1:-1, :] = g[2:, :] - g[:-2, :]
    mag = np.hypot(gx, gy)
    return float(np.mean(mag > mag_thresh))


def is_background_white(
    image: np.ndarray,
    mean_thresh: float = 110,
    stddev_thresh: float = 80,
    color_diff_thresh: float = 35,
    edge_density_thresh: float = 0.09,
    margin: int = 10,
) -> bool:
    """app.py:4813-4853 — border-margin pixel statistics (exact) plus
    edge density (Sobel stand-in for Canny)."""
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    top = image[0:margin, :, :]
    bottom = image[-margin:, :, :]
    left = image[:, 0:margin, :]
    right = image[:, -margin:, :]
    border_pixels = np.vstack(
        [top.reshape(-1, 3), bottom.reshape(-1, 3), left.reshape(-1, 3), right.reshape(-1, 3)]
    ).astype(np.float64)

    mean_val = float(np.mean(border_pixels))
    std_val = float(np.std(border_pixels))
    color_diff = np.max(border_pixels, axis=1) - np.min(border_pixels, axis=1)
    max_color_diff = float(np.max(color_diff))

    gray_border = to_gray(np.concatenate([top, bottom], axis=0))
    edge_density = _sobel_edge_density(gray_border)

    return (
        mean_val > mean_thresh
        and std_val < stddev_thresh
        and max_color_diff < color_diff_thresh
        and edge_density < edge_density_thresh
    )


def get_signature_angle(image: np.ndarray) -> float:
    """app.py:4854-4868 — orientation of the mark via PCA (over
    foreground pixels; the reference uses the largest contour's points)."""
    mask = foreground_mask(image)
    ys, xs = np.nonzero(mask)
    if len(xs) < 2:
        return 0.0
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    centered = pts - pts.mean(axis=0)
    cov = centered.T @ centered / len(centered)
    eigvals, eigvecs = np.linalg.eigh(cov)
    principal = eigvecs[:, int(np.argmax(eigvals))]
    return math.degrees(math.atan2(principal[1], principal[0]))


def is_signature_horizontal(image: np.ndarray, angle_threshold: float = 40) -> bool:
    """app.py:4873-4876."""
    angle = get_signature_angle(image)
    normalized_angle = abs(angle % 180)
    return normalized_angle < angle_threshold or abs(normalized_angle - 180) < angle_threshold


def rotate_image_to_horizontal(image: np.ndarray) -> np.ndarray:
    """app.py:4878-4886 — 90° clockwise when taller than wide."""
    h, w = image.shape[:2]
    if w >= h:
        return image
    return np.rot90(image, k=-1)


def is_straight_line_signature(
    image: np.ndarray,
    width_expand: float = 4.0,
    pixel_threshold: float = 9.5,
) -> bool:
    """app.py:4736-4811 decision tests over the axis-aligned foreground
    crop (the reference rotates the minAreaRect first; for near-horizontal
    marks the tests coincide).  The box is expanded ``width_expand``×
    along its minor dimension before the ROI tests, exactly like the
    reference (app.py:4759-4762) — that margin is what makes the
    vertical-spread and touch tests meaningful."""
    from ocr_api_spark.kernels.image import remove_vertical_lines

    # app.py:4741-4744: table rules / borders (30-px vertical runs) are
    # opened out of the ink mask before the box tests
    mask = remove_vertical_lines(foreground_mask(image), 30)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return False
    y0, y1, x0, x1 = int(ys.min()), int(ys.max()) + 1, int(xs.min()), int(xs.max()) + 1
    bw, bh = x1 - x0, y1 - y0
    cy, cx = (y0 + y1) / 2.0, (x0 + x1) / 2.0
    if bw < bh:
        bw = int(bw * width_expand)
    else:
        bh = int(bh * width_expand)
    y0 = max(0, int(cy - bh / 2))
    y1 = min(mask.shape[0], int(cy + bh / 2))
    x0 = max(0, int(cx - bw / 2))
    x1 = min(mask.shape[1], int(cx + bw / 2))
    roi = mask[y0:y1, x0:x1]
    h, w = roi.shape
    if roi.size == 0:
        return False

    vertical_sum = roi.sum(axis=1)
    non_zero_rows = int(np.count_nonzero(vertical_sum > 0))
    vertical_ratio = non_zero_rows / h

    touches_top = bool(np.any(roi[:5, :].sum(axis=1) > pixel_threshold))
    touches_bottom = bool(np.any(roi[-5:, :].sum(axis=1) > pixel_threshold))
    aspect_ratio = max(w, h) / (min(w, h) + 1e-5)

    return (
        vertical_ratio > 0.97 and not touches_top and not touches_bottom and aspect_ratio > 2.5
    ) or (vertical_ratio < 0.3 and aspect_ratio > 10 and not touches_top and not touches_bottom)


def classify_signature(image: np.ndarray) -> dict:
    """The /api/verify-signature-format decision set (app.py:4895+):
    background-white gate, orientation check, rotation decision,
    straight-line verdict."""
    background_white = is_background_white(image)
    horizontal = is_signature_horizontal(image)
    straight_line = is_straight_line_signature(image)
    h, w = image.shape[:2]
    return {
        "is_background_white": background_white,
        "is_horizontal": horizontal,
        "needs_rotation": h > w,
        "is_straight_line": straight_line,
    }
