"""Pure-numpy PNG codec: stdlib ``zlib`` inflate + spec §9 row
unfiltering (None/Sub/Up/Average/Paeth), 1/2/4/8/16-bit gray, 8/16-bit RGB /
palette / gray+alpha / RGBA, non-interlaced and Adam7-interlaced
(16-bit samples keep the high byte — the cv2/PIL 8-bit convention).

Two consumers share this module:

- the multimodal image branch (``operators/multimodal._Decoder``)
  decodes real PNG payloads into the cv2 array convention the
  reference's ``cv2.imread`` produces (app.py:419-443 raster path):
  2-D uint8 for grayscale, H×W×3 **BGR** for color, H×W×4 **BGRA**
  when an alpha channel is present;
- the PDF text layer (``sources/pdftext``) applies the same row
  unfiltering to ``/FlateDecode`` streams with PNG predictors
  (``/Predictor >= 10``).

``encode_png`` is the fixture writer: it can apply any filter type
per row, so decode tests exercise every unfilter branch by
round-trip.  None/Up rows are fully vectorized and Sub rows are a
per-lane mod-256 prefix sum (cumsum); only Average/Paeth rows are
inherently sequential per byte and fall back to a Python loop — fine
for the batch-UDF sizes this feeds (documents, not video frames).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class PngError(Exception):
    pass


_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def unfilter_scanlines(data: bytes, row_bytes: int, bpp: int) -> bytes:
    """Invert PNG row filtering: ``data`` is rows of (1 filter byte +
    ``row_bytes`` payload); returns the concatenated raw rows.  ``bpp``
    is the byte distance to the pixel to the left (PNG spec: filters
    operate on bytes, not samples)."""
    stride = row_bytes + 1
    if row_bytes <= 0 or bpp <= 0:
        raise PngError(f"bad geometry row_bytes={row_bytes} bpp={bpp}")
    n_rows, rem = divmod(len(data), stride)
    if rem or n_rows == 0:
        raise PngError(f"filtered data length {len(data)} not a multiple of stride {stride}")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(n_rows, stride)
    out = np.zeros((n_rows, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.int32)
    for r in range(n_rows):
        ftype = int(raw[r, 0])
        row = raw[r, 1:].astype(np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up — vectorized, no intra-row dependency
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub — a per-lane prefix sum (mod-256 cumsum)
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.int64) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth — sequential per byte
            cur = np.zeros(row_bytes, dtype=np.int32)
            for i in range(row_bytes):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.tobytes()


_MAX_PIXELS = 64_000_000  # corrupted IHDR dims must not OOM the executor
_MAX_SAMPLE_BYTES = 128_000_000  # decoded samples (w*h*ch*bytes), pre-temporaries


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array in cv2 convention: 2-D grayscale,
    H×W×3 BGR, or H×W×4 BGRA (gray+alpha expands to BGRA so the
    alpha-flatten step downstream sees one shape per alpha image).

    Every parse-time failure on untrusted bytes surfaces as
    ``PngError`` — a corrupted payload must be a decode *failure*, not
    a poison pill that kills the Spark task (fuzz-tested)."""
    try:
        return _decode_png(data)
    except PngError:
        raise
    except (IndexError, KeyError, ValueError, OverflowError, struct.error) as e:
        raise PngError(f"malformed PNG: {type(e).__name__}: {e}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_SIGNATURE):
        raise PngError("not a PNG payload")
    pos = len(_SIGNATURE)
    ihdr: bytes | None = None
    plte: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise PngError(f"truncated {ctype!r} chunk")
        pos += 12 + length  # length + type + payload + crc (crc not verified)
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise PngError("missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth not in (1, 2, 4, 8, 16):
        raise PngError(f"bit depth {depth} unsupported")
    if depth < 8 and color_type not in (0, 3):
        raise PngError(f"sub-byte depth {depth} is only legal for gray/palette")
    if depth == 16 and color_type == 3:
        raise PngError("16-bit palette images are not legal PNG")
    if comp != 0 or filt != 0:
        raise PngError("nonzero compression/filter method")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise PngError(f"color type {color_type} unsupported")
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    if width * height > _MAX_PIXELS:
        raise PngError(f"image {width}x{height} exceeds the pixel cap")
    # the pixel cap alone under-counts a 16-bit RGBA image by 8x (ADVICE
    # r3): bound the decoded SAMPLE bytes too, since unfilter temporaries
    # scale with width*height*channels*bytes_per_sample, not pixels
    if width * height * channels * (2 if depth == 16 else 1) > _MAX_SAMPLE_BYTES:
        raise PngError(
            f"image {width}x{height}x{channels}@{depth} exceeds the sample-byte cap"
        )

    # expected filtered size is fully determined by the header, so the
    # inflate is BOUNDED — a zlib bomb cannot out-allocate the pixel cap
    # (review finding, reproduced: a 194 KB payload inflating to 200 MB)
    def row_stride(pw: int) -> int:
        return 1 + (pw * channels * depth + 7) // 8

    if interlace == 0:
        expected = height * row_stride(width)
    else:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw and ph:
                expected += ph * row_stride(pw)
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected)
    except zlib.error as e:
        raise PngError(f"bad IDAT zlib stream: {e}") from e
    if len(raw) < expected:
        raise PngError("IDAT inflates short of the declared geometry")
    if depth < 8:
        # 1/2/4-bit rows (1-bit = the classic document-scan PNG): one
        # filter byte per row, samples packed MSB-first, bpp=1 for the
        # byte-level filters; unpack, regroup, trim the row padding
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)

        def unpack(chunk: bytes, pw: int, ph: int) -> np.ndarray:
            rb = (pw * depth + 7) // 8
            rows = np.frombuffer(unfilter_scanlines(chunk, rb, 1), dtype=np.uint8)
            bits = np.unpackbits(rows.reshape(ph, rb), axis=1)[:, : pw * depth]
            return (bits.reshape(ph, pw, depth) * weights).sum(axis=2).astype(np.uint8)

        if interlace == 0:
            samples = unpack(raw, width, height)
        else:
            samples = np.zeros((height, width), dtype=np.uint8)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx if width > x0 else 0
                ph = (height - y0 + dy - 1) // dy if height > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                stride = 1 + (pw * depth + 7) // 8
                chunk = raw[pos : pos + ph * stride]
                pos += ph * stride
                samples[y0::dy, x0::dx] = unpack(chunk, pw, ph)
        if color_type == 0:  # gray: expand to full 8-bit range
            samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        arr = samples[:, :, None]
    else:
        bps = depth // 8
        bpp = channels * bps
        dtype = np.uint8 if depth == 8 else np.dtype(">u2")
        if interlace == 0:
            pix = np.frombuffer(unfilter_scanlines(raw, width * bpp, bpp), dtype=dtype)
            arr = pix.reshape(height, width, channels)
        else:  # Adam7: seven independently-filtered sub-images, scattered
            arr = np.zeros((height, width, channels), dtype=dtype)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx if width > x0 else 0
                ph = (height - y0 + dy - 1) // dy if height > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                stride = 1 + pw * bpp
                chunk = raw[pos : pos + ph * stride]
                pos += ph * stride
                sub = np.frombuffer(unfilter_scanlines(chunk, pw * bpp, bpp), dtype=dtype)
                arr[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if depth == 16:  # cv2/PIL 8-bit convention: keep the high byte
            arr = (arr.astype(np.uint16) >> 8).astype(np.uint8)
        else:
            arr = arr.astype(np.uint8)
    if color_type == 3:  # palette → RGB rows
        if plte is None or len(plte) % 3:
            raise PngError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise PngError("palette index out of range")
        arr = pal[idx]
        channels = 3
    if channels == 1:
        return arr[:, :, 0].copy()
    if channels == 2:  # gray+alpha → BGRA
        g = arr[:, :, 0]
        return np.dstack([g, g, g, arr[:, :, 1]]).copy()
    if channels == 3:  # RGB → BGR
        return arr[:, :, ::-1].copy()
    return arr[:, :, [2, 1, 0, 3]].copy()  # RGBA → BGRA


def _filter_row(row: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Apply (not invert) one spec filter — the encoder side, so
    round-trip tests prove unfilter_scanlines inverts every branch."""
    n = row.shape[0]
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        a = int(r[i - bpp]) if i >= bpp else 0
        b = int(p[i])
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            c = int(p[i - bpp]) if i >= bpp else 0
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[i] = (r[i] - pred) & 0xFF
    return out.astype(np.uint8)


def encode_png(
    arr: np.ndarray, filter_types: int | list[int] = 0, interlace: bool = False
) -> bytes:
    """Fixture writer: array (2-D gray, H×W×3 BGR, H×W×4 BGRA — the
    same convention ``decode_png`` returns) → PNG bytes.  uint8 input
    writes 8-bit samples; uint16 writes 16-bit (big-endian).
    ``filter_types`` selects the per-row filter (int for all rows, or
    one per row when non-interlaced) so tests can exercise each
    unfilter branch; ``interlace=True`` writes Adam7 passes, each
    filtered independently."""
    a = np.asarray(arr)
    if a.dtype == np.uint16:
        depth = 16
    else:
        a = a.astype(np.uint8)
        depth = 8
    if a.ndim == 2:
        color_type, channels = 0, 1
        rgb = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
        rgb = a[:, :, ::-1]  # BGR → RGB
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
        rgb = a[:, :, [2, 1, 0, 3]]  # BGRA → RGBA
    else:
        raise PngError(f"unsupported array shape {a.shape}")
    height, width = a.shape[0], a.shape[1]
    bps = depth // 8
    bpp = channels * bps

    def sample_bytes(sub: np.ndarray) -> np.ndarray:
        """rows of raw filter input: (h, w*channels*bps) uint8."""
        if depth == 8:
            return sub.reshape(sub.shape[0], -1)
        be = sub.astype(">u2")
        return np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(sub.shape[0], -1)

    body = bytearray()
    if interlace:
        if not isinstance(filter_types, int):
            raise PngError("interlaced encode takes a single filter type")
        for x0, y0, dx, dy in _ADAM7:
            sub = rgb[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = sample_bytes(sub)
            prev = np.zeros(rows.shape[1], dtype=np.uint8)
            for r in range(rows.shape[0]):
                body.append(filter_types)
                body += _filter_row(rows[r], prev, filter_types, bpp).tobytes()
                prev = rows[r]
    else:
        if isinstance(filter_types, int):
            filter_types = [filter_types] * height
        if len(filter_types) != height:
            raise PngError("one filter type per row required")
        rows = sample_bytes(rgb)
        prev = np.zeros(width * bpp, dtype=np.uint8)
        for r in range(height):
            ftype = int(filter_types[r])
            body.append(ftype)
            body += _filter_row(rows[r], prev, ftype, bpp).tobytes()
            prev = rows[r]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )
