"""Aadhaar-number masking kernel (geometry decisions only).

Port of ``mask_aadhaar_number`` (app.py:5731-5780) with the OpenCV
mutation factored out: given the OCR token table (text, conf, 4-point
box) and the image dimensions, return the black-rectangle mask regions
the reference would draw.  The actual pixel mutation is an image-sink
concern (the reference returns base64 JPEG; our layout branch carries
the rects so any sink can apply them); this keeps the kernel
dependency-free and the fixtures deterministic.
"""

from __future__ import annotations

import re

# r8: precompiled hot-path patterns (module-level, once per worker)
_RX0 = re.compile(r"\D")

_AADHAAR_REGEX = re.compile(r"\b\d{4}\s?\d{4}\s?\d{4}\b")


def mask_aadhaar_regions(
    tokens: list[tuple[str, float, list[list[int]]]],
    img_height: int,
    img_width: int,
) -> list[dict]:
    """Returns the mask rectangles ``{"x_min", "y_min", "x_max", "y_max"}``
    in reference order.  Reference semantics preserved exactly:

    - per-token confusion repair O→0, I→1, |→1 (app.py:5739)
    - 12-digit check after separator strip (app.py:5744-5746)
    - skip boxes with height > 100 or < 10 (app.py:5760)
    - mask covers the first 8/12ths of the box width (app.py:5772-5773)
    - stop after two masked matches (app.py:5777-5779)
    """
    regions: list[dict] = []
    matches = 0
    for text, _conf, box in tokens:
        cleaned_text = text.replace("O", "0").replace("I", "1").replace("|", "1")
        match = _AADHAAR_REGEX.search(cleaned_text)
        if not match:
            continue
        aadhaar_raw = match.group(0)
        aadhaar_digits = _RX0.sub("", aadhaar_raw)
        if len(aadhaar_digits) != 12:
            continue

        box_arr = [[int(pt[0]), int(pt[1])] for pt in box]
        x_min = min(pt[0] for pt in box_arr)
        x_max = max(pt[0] for pt in box_arr)
        y_min = min(pt[1] for pt in box_arr)
        y_max = max(pt[1] for pt in box_arr)

        height = y_max - y_min
        if height > 100 or height < 10:
            continue

        x_min = max(0, x_min)
        y_min = max(0, y_min)
        x_max = min(img_width, x_max)
        y_max = min(img_height, y_max)

        char_width = (x_max - x_min) // 12
        mask_end_x = x_min + char_width * 8

        regions.append({"x_min": x_min, "y_min": y_min, "x_max": mask_end_x, "y_max": y_max})
        matches += 1
        if matches >= 2:
            break
    return regions


def apply_mask_regions(img, regions: list[dict]):
    """Black out the mask rectangles in the pixel array — the
    cv2.rectangle(..., (0,0,0), thickness=-1) of app.py:5775, with cv2's
    clip-to-image behavior.  cv2 fills BOTH corner pixels inclusive, so
    the slice end is max+1.  Works on gray (H×W) or color (H×W×C)."""
    import numpy as np

    out = np.array(img, copy=True)
    h, w = out.shape[:2]
    for r in regions:
        x0 = max(0, int(r["x_min"]))
        y0 = max(0, int(r["y_min"]))
        x1 = min(w, int(r["x_max"]) + 1)
        y1 = min(h, int(r["y_max"]) + 1)
        if x1 > x0 and y1 > y0:
            out[y0:y1, x0:x1] = 0
    return out


def order_tokens_reading(tokens: list[tuple[str, float, list[list[int]]]], y_band: int = 10):
    """Bounding-box reading-order sort (SURVEY.md §2.6 I13): the
    reference trusts PaddleOCR's output order (app.py:2167); when token
    order is not given our layout branch re-derives it by (y-band, x).
    Deterministic: band = y_min // y_band."""
    def key(tok):
        _text, _conf, box = tok
        y_min = min(pt[1] for pt in box)
        x_min = min(pt[0] for pt in box)
        return (int(y_min) // y_band, int(x_min), int(y_min))

    return sorted(tokens, key=key)


def tokens_to_text(tokens: list[tuple[str, float, list[list[int]]]], conf_threshold: float = 0.0) -> str:
    """Confidence-thresholded token merge → the newline-joined OCR text
    IR (``"\\n".join(line[1][0] ...)``, app.py:2167)."""
    return "\n".join(text for text, conf, _box in tokens if conf >= conf_threshold)
