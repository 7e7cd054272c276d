"""Signature-geometry kernels (reference I7-I10, app.py:4736-4886).

The reference uses OpenCV; these are numpy re-implementations of the
SAME pipeline — the cv2 primitives live in ``kernels/contours.py``
(connected components + external boundary for ``findContours``,
rotating calipers for ``minAreaRect``, a real Canny with L1 magnitude
+ NMS + hysteresis, INTER_AREA resize, rotation warp and
``getRectSubPix``), so the straight-line verdict now runs the
reference's exact flow: vertical-line removal → largest external
contour → minAreaRect → minor-axis ×4 expansion → rotate gray about
the rect center → sub-pixel ROI crop → Otsu re-threshold →
spread/touch/aspect tests (app.py:4736-4811).  The one documented
interpolation difference: the rotation warp samples bilinearly where
cv2 uses INTER_CUBIC — the ROI is re-thresholded immediately after,
where the interpolant is immaterial.

Otsu, the border statistics, and every decision threshold are exact
ports.
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


def _largest_contour_points(mask: np.ndarray) -> np.ndarray | None:
    """The largest external contour's point set — findContours(
    RETR_EXTERNAL) → max by area, as boundary pixels of the largest
    hole-filled component."""
    from ocr_api_spark.kernels.contours import boundary_points, fill_holes, largest_component

    comp = largest_component(mask)
    if comp is None:
        return None
    pts = boundary_points(fill_holes(comp))
    return pts if len(pts) else None


def is_background_white(
    image: np.ndarray,
    mean_thresh: float = 110,
    stddev_thresh: float = 80,
    color_diff_thresh: float = 35,
    edge_density_thresh: float = 0.09,
    margin: int = 10,
) -> bool:
    """app.py:4813-4853 — border-margin pixel statistics plus Canny
    edge density over the combined border strip (left/right margins
    INTER_AREA-resized to the top strip's width, exactly like the
    reference's cv2.resize + vstack)."""
    from ocr_api_spark.kernels.contours import area_resize, canny

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

    combined_border = np.concatenate(
        [
            top,
            bottom,
            area_resize(left, top.shape[1], margin),
            area_resize(right, top.shape[1], margin),
        ],
        axis=0,
    )
    edges = canny(to_gray(combined_border), 50.0, 150.0)
    edge_density = float(np.sum(edges > 0) / edges.size)

    return (
        mean_val > mean_thresh
        and std_val < stddev_thresh
        and max_color_diff < color_diff_thresh
        and edge_density < edge_density_thresh
    )


def get_signature_angle(image: np.ndarray) -> float:
    """app.py:4854-4868 — PCA over the largest external contour's
    points; the first eigenvector's direction in degrees."""
    pts = _largest_contour_points(foreground_mask(image))
    if pts is None or len(pts) < 2:
        return 0.0
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
    row_ratio_thresh: float = 0.95,
    pixel_threshold: float = 9.5,
) -> bool:
    """app.py:4736-4811, the exact flow: Otsu-INV ink mask →
    vertical-line removal (1×30 MORPH_OPEN + subtract, table rules and
    borders) → largest external contour → minAreaRect → expand the
    minor dimension ``width_expand``× → rotate the GRAY image by the
    rect angle about its center → getRectSubPix ROI → Otsu-INV
    re-threshold → vertical-spread / border-touch / aspect tests.

    Faithful quirk: the touch tests count pixels ``== 255`` in the
    GRAY ROI (app.py:4789-4792 reads ``roi``, not ``clean_bin``) —
    i.e. fully-saturated white, not ink."""
    from ocr_api_spark.kernels.contours import get_rect_subpix, min_area_rect, warp_rotate
    from ocr_api_spark.kernels.image import remove_vertical_lines

    gray = to_gray(image)
    mask = remove_vertical_lines(gray <= otsu_threshold(gray), 30)
    pts = _largest_contour_points(mask)
    if pts is None:
        return False

    center, (w, h), angle = min_area_rect(pts)
    if w < h:
        w *= width_expand
    else:
        h *= width_expand

    rotated = warp_rotate(gray, center, angle)
    roi = get_rect_subpix(rotated, (int(w), int(h)), center)
    if roi.size == 0:
        return False

    clean_bin = (roi <= otsu_threshold(roi)).astype(np.uint8) * 255
    vertical_sum = np.sum(clean_bin == 255, axis=1)
    non_zero_rows = int(np.count_nonzero(vertical_sum > 0))
    vertical_ratio = non_zero_rows / roi.shape[0]

    touches_top = bool(np.any(np.sum(roi[:5, :] == 255, axis=1) > pixel_threshold))
    touches_bottom = bool(np.any(np.sum(roi[-5:, :] == 255, axis=1) > pixel_threshold))
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
