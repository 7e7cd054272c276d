"""OCR-engine result adapters → the token-table IR (S7-S9).

The engines themselves (PaddleOCR inference, Tesseract subprocess) are
the environment gate; everything AFTER the engine call is pure parsing,
implemented here exactly as the reference consumes each result shape:

- legacy ``PaddleOCR.ocr()``: per-image list of ``[box, (text, conf)]``
  lines.  The reference both flattens it to text (with a per-endpoint
  join quirk: '\\n' at app.py:2167, ' ' at app.py:1963) and iterates it
  for masking geometry (app.py:5737 ``box, (text, conf) = line``).
- new ``PaddleOCR.predict()``: ``result[0]["rec_texts"]`` joined with
  '\\n' (app.py:5143-5146), missing key → empty.
- Tesseract ``image_to_data`` TSV: header + one row per item; only
  word-level rows (level 5) with non-empty text become tokens, boxes
  from left/top/width/height, confidence normalized from percent.

Each adapter returns the ``(text, conf, box)`` triples the masking /
reading-order / token-text operators consume, so any engine plugs into
the same Spark plan.
"""

from __future__ import annotations


def paddle_legacy_tokens(results) -> list[tuple[str, float, list[list[int]]]]:
    """[[box, (text, conf)], ...] per image → token triples (the shape
    mask_aadhaar_number iterates, app.py:5737)."""
    tokens = []
    for result in results or []:
        for line in result or []:
            box, (text, conf) = line
            tokens.append((text, float(conf), [[int(p[0]), int(p[1])] for p in box]))
    return tokens


def paddle_legacy_text(results, sep: str = "\n") -> str:
    """The reference's flatten: ``sep.join(line[1][0] ...)`` — '\\n' for
    the PAN/Aadhaar endpoints (app.py:2167), ' ' for get_index
    (app.py:1963)."""
    return sep.join(line[1][0] for result in (results or []) for line in (result or []))


def paddle_predict_text(result) -> str:
    """New pipeline API: '\\n'.join(result[0].get("rec_texts", []))
    (app.py:5143-5146)."""
    if not result:
        return ""
    return "\n".join(result[0].get("rec_texts", []))


def tesseract_tsv_tokens(tsv: str) -> list[tuple[str, float, list[list[int]]]]:
    """pytesseract ``image_to_data`` TSV → token triples: word-level
    rows (level 5), empty text skipped, conf -1 (layout rows) skipped,
    percent confidence scaled to [0, 1], box as the 4 corner points of
    (left, top, width, height)."""
    lines = (tsv or "").splitlines()
    if not lines:
        return []
    header = lines[0].split("\t")
    idx = {name: i for i, name in enumerate(header)}
    required = {"level", "left", "top", "width", "height", "conf", "text"}
    if not required <= set(idx):
        return []
    tokens = []
    for row in lines[1:]:
        cols = row.split("\t")
        if len(cols) < len(header):
            continue
        try:
            level = int(cols[idx["level"]])
            conf = float(cols[idx["conf"]])
        except ValueError:
            continue
        text = cols[idx["text"]]
        if level != 5 or conf < 0 or not text.strip():
            continue
        left, top = int(cols[idx["left"]]), int(cols[idx["top"]])
        w, h = int(cols[idx["width"]]), int(cols[idx["height"]])
        box = [[left, top], [left + w, top], [left + w, top + h], [left, top + h]]
        tokens.append((text, conf / 100.0, box))
    return tokens


# --- live-subprocess seam (S7/S8/S10) ---------------------------------------


def _default_run(argv: list[str], inp: bytes) -> bytes:
    import subprocess

    return subprocess.run(
        argv, input=inp, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        timeout=60, check=True,
    ).stdout


def tesseract_available(binary: str = "tesseract") -> bool:
    import shutil

    return shutil.which(binary) is not None


def tesseract_image_to_data(image, binary: str = "tesseract", run=None) -> str:
    """The last seam between the adapters and a REAL engine: PNG-encode
    the array (kernels/png.py — no temp files, no cv2) and pipe it to
    ``tesseract stdin stdout tsv``, returning the image_to_data TSV that
    ``tesseract_tsv_tokens`` parses (reference app.py:3219, 5104 via
    pytesseract, which shells out to the same binary the same way).

    ``run(argv, input_bytes) -> stdout_bytes`` is injectable so the
    argv/stdin wiring is testable without the binary; the default uses
    ``subprocess.run`` with a 60 s timeout."""
    from ocr_api_spark.kernels.png import encode_png

    png = encode_png(image)
    argv = [binary, "stdin", "stdout", "tsv"]
    return (run or _default_run)(argv, png).decode("utf-8", errors="replace")


def tesseract_osd_output(image, binary: str = "tesseract", run=None) -> str:
    """OSD text for ``kernels/image.parse_osd_rotate`` (S10): the
    ``--psm 0`` orientation-only mode pytesseract's image_to_osd wraps."""
    from ocr_api_spark.kernels.png import encode_png

    png = encode_png(image)
    argv = [binary, "stdin", "stdout", "--psm", "0"]
    return (run or _default_run)(argv, png).decode("utf-8", errors="replace")
