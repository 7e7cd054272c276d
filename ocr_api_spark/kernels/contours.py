"""Contour geometry kernels — the cv2 primitives the signature branch
needs (reference app.py:4736-4886), re-derived in numpy:

- connected-component labeling (8-connectivity, run-based union-find) —
  the ``findContours(RETR_EXTERNAL)`` region decomposition;
- hole filling + external boundary extraction — the external contour's
  point set;
- convex hull (monotone chain) + rotating calipers — ``minAreaRect``;
- Canny (3×3 Sobel, L1 magnitude like cv2's default, 4-direction
  non-maximum suppression, double-threshold hysteresis with
  8-connected strong-edge propagation);
- INTER_AREA resize (separable box filter with fractional coverage) and
  bilinear affine-rotation / ``getRectSubPix`` sampling (cv2 uses cubic
  for the warp; bilinear is the documented stand-in — the downstream
  tests threshold the ROI, where the interpolant choice is immaterial).

Everything is deterministic and allocation-bounded by the input size.
"""

from __future__ import annotations

import math

import numpy as np


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connected component labels (0 = background, 1..n) via run-based
    union-find: one Python iteration per ROW, everything inside a row
    vectorized — exact and O(pixels)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]  # parent[i] for union-find; 0 = background

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    prev_runs: list[tuple[int, int, int]] = []  # (x0, x1, label) of row above
    for y in range(h):
        row = mask[y]
        if not row.any():
            prev_runs = []
            continue
        padded = np.empty(w + 2, dtype=bool)
        padded[0] = padded[-1] = False
        padded[1:-1] = row
        d = np.flatnonzero(padded[1:] != padded[:-1])
        starts, ends = d[0::2], d[1::2]
        runs: list[tuple[int, int, int]] = []
        for x0, x1 in zip(starts, ends):
            lab = 0
            # 8-connectivity: a run touches a run above if x-ranges
            # overlap when the upper one is widened by 1 on each side
            for px0, px1, plab in prev_runs:
                if px0 - 1 < x1 and px1 + 1 > x0:
                    root = find(plab)
                    if lab == 0:
                        lab = root
                    elif root != lab:
                        parent[root] = find(lab)
            if lab == 0:
                parent.append(len(parent))
                lab = len(parent) - 1
            labels[y, x0:x1] = lab
            runs.append((int(x0), int(x1), lab))
        prev_runs = runs

    # flatten the union-find and compact label ids
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int32)
    uniq = np.unique(roots[1:]) if len(parent) > 1 else np.array([], dtype=np.int32)
    remap = np.zeros(len(parent), dtype=np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    return remap[roots[labels]], int(len(uniq))


def largest_component(mask: np.ndarray) -> np.ndarray | None:
    """The largest 8-connected foreground region (by pixel count, the
    selection the reference makes with ``max(contours, key=contourArea)``
    over external contours), or None when the mask is empty."""
    labels, n = label_components(mask)
    if n == 0:
        return None
    counts = np.bincount(labels.ravel(), minlength=n + 1)
    counts[0] = 0
    return labels == int(np.argmax(counts))


def fill_holes(mask: np.ndarray) -> np.ndarray:
    """Fill interior holes: background 4-connected to the image border
    stays background, everything else becomes foreground (so boundary
    extraction sees only the EXTERNAL contour, like RETR_EXTERNAL)."""
    h, w = mask.shape
    outside = np.zeros((h, w), dtype=bool)
    bg = ~mask
    outside[0] = bg[0]
    outside[-1] = bg[-1]
    outside[:, 0] = bg[:, 0]
    outside[:, -1] = bg[:, -1]
    while True:
        grow = outside.copy()
        grow[1:] |= outside[:-1]
        grow[:-1] |= outside[1:]
        grow[:, 1:] |= outside[:, :-1]
        grow[:, :-1] |= outside[:, 1:]
        grow &= bg
        if (grow == outside).all():
            break
        outside = grow
    return ~outside


def boundary_points(mask: np.ndarray) -> np.ndarray:
    """(N, 2) array of (x, y) for foreground pixels with at least one
    4-connected background (or image-edge) neighbor — the external
    contour's pixel set when the mask is hole-filled."""
    padded = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask
    interior = (
        padded[1:-1, 1:-1]
        & padded[:-2, 1:-1]
        & padded[2:, 1:-1]
        & padded[1:-1, :-2]
        & padded[1:-1, 2:]
    )
    ys, xs = np.nonzero(mask & ~interior)
    return np.stack([xs, ys], axis=1).astype(np.float64)


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over (x, y) points → CCW hull vertices
    (in image coordinates with y down this is clockwise on screen,
    matching cv2's convention)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    ordered = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    lower = half(ordered)
    upper = half(ordered[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray) -> tuple[tuple[float, float], tuple[float, float], float]:
    """Rotating calipers over the convex hull: the minimum-area oriented
    bounding rectangle as ``((cx, cy), (w, h), angle_deg)`` — the same
    triple shape cv2.minAreaRect returns.  Normalization (stronger than
    cv2's, whose w/h↔angle pairing depends on which hull edge wins):
    ``w`` is always the MAJOR extent and ``angle`` the major axis
    direction in degrees ∈ [-90, 90), y-down image coordinates — so
    rotating the image by ``angle`` about the center always lays the
    long side horizontal, which is the invariant the signature flow
    depends on.  The degenerate all-collinear case yields a
    zero-thickness rect."""
    hull = convex_hull(np.asarray(pts, dtype=np.float64))
    if len(hull) == 1:
        return (float(hull[0][0]), float(hull[0][1])), (0.0, 0.0), 0.0
    best = None
    edges = np.roll(hull, -1, axis=0) - hull
    for ex, ey in edges:
        norm = math.hypot(ex, ey)
        if norm == 0:
            continue
        ux, uy = ex / norm, ey / norm
        proj_u = hull[:, 0] * ux + hull[:, 1] * uy
        proj_v = -hull[:, 0] * uy + hull[:, 1] * ux
        w = proj_u.max() - proj_u.min()
        h = proj_v.max() - proj_v.min()
        area = w * h
        if best is None or area < best[0] - 1e-12:
            cu = (proj_u.max() + proj_u.min()) / 2.0
            cv_ = (proj_v.max() + proj_v.min()) / 2.0
            cx = cu * ux - cv_ * uy
            cy = cu * uy + cv_ * ux
            angle = math.degrees(math.atan2(uy, ux))
            if w < h:  # report the major axis: swap extents, turn 90°
                w, h = h, w
                angle += 90.0
            angle = (angle + 90.0) % 180.0 - 90.0  # → [-90, 90)
            best = (area, (cx, cy), (w, h), angle)
    assert best is not None
    return (
        (float(best[1][0]), float(best[1][1])),
        (float(best[2][0]), float(best[2][1])),
        float(best[3]),
    )


def _sobel3(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """3×3 Sobel with edge replication (cv2 BORDER_REPLICATE default)."""
    g = np.pad(gray.astype(np.float64), 1, mode="edge")
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    )
    gy = (
        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
    )
    return gx, gy


def canny(gray: np.ndarray, low: float = 50.0, high: float = 150.0) -> np.ndarray:
    """cv2.Canny's pipeline: 3×3 Sobel, L1 magnitude (|gx|+|gy|, the
    cv2 default), 4-direction non-maximum suppression, double-threshold
    hysteresis with 8-connected propagation from strong edges.  Returns
    uint8 0/255."""
    gx, gy = _sobel3(gray)
    mag = np.abs(gx) + np.abs(gy)

    # quantize gradient direction to {0°, 45°, 90°, 135°}
    angle = np.degrees(np.arctan2(gy, gx)) % 180.0
    d0 = (angle < 22.5) | (angle >= 157.5)
    d45 = (angle >= 22.5) & (angle < 67.5)
    d90 = (angle >= 67.5) & (angle < 112.5)
    d135 = ~(d0 | d45 | d90)

    p = np.pad(mag, 1, mode="constant")
    c = p[1:-1, 1:-1]
    nms = (
        (d0 & (c >= p[1:-1, 2:]) & (c >= p[1:-1, :-2]))
        | (d45 & (c >= p[:-2, 2:]) & (c >= p[2:, :-2]))
        | (d90 & (c >= p[:-2, 1:-1]) & (c >= p[2:, 1:-1]))
        | (d135 & (c >= p[:-2, :-2]) & (c >= p[2:, 2:]))
    )
    strong = nms & (mag > high)
    weak = nms & (mag > low)

    # hysteresis: weak pixels 8-connected to a strong pixel survive
    edges = strong.copy()
    while True:
        p2 = np.pad(edges, 1, mode="constant")
        grow = (
            p2[:-2, :-2] | p2[:-2, 1:-1] | p2[:-2, 2:]
            | p2[1:-1, :-2] | p2[1:-1, 2:]
            | p2[2:, :-2] | p2[2:, 1:-1] | p2[2:, 2:]
        )
        nxt = edges | (weak & grow)
        if (nxt == edges).all():
            break
        edges = nxt
    return edges.astype(np.uint8) * 255


def _area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) fractional-coverage matrix of a 1-D box filter —
    INTER_AREA's separable kernel for arbitrary ratios."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float64)
    for i in range(dst):
        a, b = i * scale, (i + 1) * scale
        j0, j1 = int(math.floor(a)), int(math.ceil(b))
        for j in range(j0, min(j1, src)):
            w[i, j] = min(b, j + 1) - max(a, j)
    return w / scale


def area_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """cv2.resize INTER_AREA: separable box average with fractional
    pixel coverage, channels preserved."""
    h, w = img.shape[:2]
    wy = _area_weights(h, out_h)
    wx = _area_weights(w, out_w)
    flat = img.astype(np.float64).reshape(h, -1)
    tmp = (wy @ flat).reshape(out_h, w, -1)
    out = np.einsum("ow,hwc->hoc", wx, tmp)
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[..., 0] if img.ndim == 2 else out


def _bilinear_sample(
    img: np.ndarray, xs: np.ndarray, ys: np.ndarray, fill: float | None = None
) -> np.ndarray:
    """Bilinear gather at float coordinates.  ``fill=None`` replicates
    the border (cv2.getRectSubPix semantics); a float fills fully
    out-of-range samples with that constant (cv2.warpAffine's default
    BORDER_CONSTANT 0 — review r4: the ROI expansion routinely leaves
    the image, and clamping to white paper where cv2 writes black
    flipped the touch tests near edges)."""
    h, w = img.shape
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    g = img.astype(np.float64)
    top = g[y0, x0] * (1 - fx) + g[y0, x1] * fx
    bot = g[y1, x0] * (1 - fx) + g[y1, x1] * fx
    out = top * (1 - fy) + bot * fy
    if fill is not None:
        # cv2 BORDER_CONSTANT approximation: a sample whose bilinear
        # weight falls entirely on out-of-image taps gets the constant
        # (xs >= w: support cols w, w+1; xs <= -1: all weight on col
        # floor(x) <= -1 — and symmetrically for y).  The 1-px partial
        # band replicates the edge instead of blending toward the
        # constant; the callers re-threshold the result, where that
        # sub-pixel band is immaterial.
        outside = (xs <= -1) | (xs >= w) | (ys <= -1) | (ys >= h)
        out = np.where(outside, fill, out)
    return out


def warp_rotate(gray: np.ndarray, center: tuple[float, float], angle_deg: float) -> np.ndarray:
    """Rotate by ``angle_deg`` about ``center`` (cv2.getRotationMatrix2D
    convention: positive angle = counter-clockwise in y-down image
    coordinates), same output size, bilinear sampling, rotated-out
    regions constant-0 like cv2.warpAffine's default border."""
    h, w = gray.shape
    a = math.radians(angle_deg)
    ca, sa = math.cos(a), math.sin(a)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = xs - center[0], ys - center[1]
    # inverse map: dest → src is the opposite rotation
    sx = center[0] + ca * dx - sa * dy
    sy = center[1] + sa * dx + ca * dy
    out = _bilinear_sample(gray, sx, sy, fill=0.0)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def get_rect_subpix(
    img: np.ndarray, size: tuple[int, int], center: tuple[float, float]
) -> np.ndarray:
    """cv2.getRectSubPix: bilinear crop of ``size=(w, h)`` centered at
    the (possibly fractional) ``center``."""
    w, h = size
    if w <= 0 or h <= 0:
        return np.zeros((max(h, 0), max(w, 0)), dtype=np.uint8)
    xs = center[0] - (w - 1) / 2.0 + np.arange(w, dtype=np.float64)
    ys = center[1] - (h - 1) / 2.0 + np.arange(h, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)
    out = _bilinear_sample(img, gx, gy)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
