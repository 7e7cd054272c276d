"""Pure-numpy JPEG codec (ITU-T T.81 / JFIF), no cv2/PIL.

Round-2 verdict called JPEG's Huffman+DCT "the genuine heavy lift" of
the image branch — this module closes it for both of the forms real
corpora contain: baseline sequential (SOF0/SOF1, the scanned-document
share) and **progressive** (SOF2 — spectral selection AND successive
approximation — the dominant web-JPEG form):

- ``decode_jpeg``: marker parse (DQT/DHT/SOF/SOS/DRI, APPn/COM skip),
  byte-destuffed Huffman entropy decode with restart-marker support;
  progressive scans accumulate into per-component coefficient planes
  (DC first/refine, AC first/refine with EOB-run state, per T.81
  G.1.2); at EOI: dequantize + dezigzag, vectorized 8×8 IDCT over all
  blocks at once (orthonormal DCT matrix, one einsum per component),
  sampling-factor plane assembly with replication chroma upsample,
  JFIF YCbCr→BGR (the cv2 convention the rest of the image branch
  uses, like ``cv2.imdecode`` in the reference flow, app.py:419-443).
  Adobe 4-component streams (print-pipeline scans) decode too: APP14
  transform 2 = YCCK (inverse YCbCr on the ink channels, K pass), 0 or
  no marker = straight CMYK; both convert inverted-ink Adobe values to
  BGR via RGB = CMY·K/255.
- ``encode_jpeg``: the matching fixture writer — Annex K quantization
  (quality-scaled, libjpeg's public formula) and Huffman tables,
  4:4:4 or 2×2-subsampled 4:2:0, restart intervals, and a
  ``progressive=True`` spectral-selection scan script — so decode
  tests cover every structural path by round-trip (JPEG is lossy:
  tests assert PSNR and progressive==baseline pixel identity; the
  successive-approximation refinement paths are pinned by a
  hand-built bit-exact stream in tests/test_jpeg.py).

Lossless/hierarchical SOFs, arithmetic coding, and 12-bit precision
raise ``JpegError`` — decoders route that to the opaque fallback.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(Exception):
    pass


# --- constant tables (ITU-T T.81 Annex K — public spec data) ---------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

DC_LUMA_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_SYMBOLS = list(range(12))
DC_CHROMA_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_SYMBOLS = list(range(12))

AC_LUMA_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_SYMBOLS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II matrix: T[i,j] = 0.5 c(i) cos((2j+1)iπ/16)
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        c = (1.0 / np.sqrt(2.0)) if _i == 0 else 1.0
        _T[_i, _j] = 0.5 * c * np.cos((2 * _j + 1) * _i * np.pi / 16.0)
del _i, _j, c

# IDCT as ONE dgemm: Tᵀ·X·T is linear in X, so with basis matrices
# E_j (1 at (j//8, j%8)) the pixel block is vec_row(X) @ M where
# M[j] = vec_row(Tᵀ·E_j·T) = vec_row(outer(T[j//8], T[j%8])).  Rows
# pre-permuted to ZIGZAG input order so dequantized zigzag-order
# coefficients multiply straight into pixels — replaces the batched
# einsum (the old path cost ~10% of a decode).
_IDCT_M = np.stack(
    [np.outer(_T[j // 8], _T[j % 8]).ravel() for j in range(64)]
)[ZIGZAG]


def _build_huffman_decoder(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(bit length, code) → symbol, canonical code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


_FAST_LUT_CACHE: dict[tuple, list] = {}
# bound the cache: standard Annex K tables dominate real corpora, but a
# corpus of optimize_coding JPEGs carries per-image tables.  Each LUT is
# a 65536-entry Python int list — ~2.5 MB counting list slots plus the
# non-interned int objects (ADVICE r4; NOT the 0.5 MB a packed array
# would take), and every pyspark worker process on an executor holds
# its own copy.  16 entries (~40 MB/worker worst case) comfortably
# covers the 4 Annex K tables plus a working set of per-image ones; LRU
# eviction (hit = pop+reinsert), evicted tables rebuild per image (a
# few ms, amortized against the decode itself).
_FAST_LUT_CACHE_MAX = 16


def _build_fast_lut(codes: dict[tuple[int, int], int], is_dc: bool) -> list[int]:
    """Fused code+magnitude LUT (the libjpeg-turbo fast path, re-derived
    for Python): one 16-bit window probe yields the FULLY decoded
    coefficient — total bits consumed, zero run, and the EXTENDed signed
    value — whenever code length + magnitude size fit the window.
    Packing: total<<20 | run<<16 | (value+0x8000); 0 = take the slow
    path (EOB/ZRL, >16-bit composites, invalid prefixes).  DC symbols
    are the size directly (run 0); AC symbols are (run<<4)|size."""
    lut = np.zeros(1 << 16, dtype=np.int64)
    for (length, code), sym in codes.items():
        run, size = (0, sym) if is_dc else (sym >> 4, sym & 0x0F)
        total = length + size
        if total > 16 or (size == 0 and not is_dc):
            continue  # AC EOB/ZRL and over-long composites stay slow
        base = code << (16 - length)
        span = 1 << (16 - length)
        if size == 0:  # DC size-0: zero diff, consume the code only
            lut[base : base + span] = (total << 20) | 0x8000
            continue
        idx = np.arange(base, base + span, dtype=np.int64)
        mag = (idx >> (16 - total)) & ((1 << size) - 1)
        val = np.where(mag < (1 << (size - 1)), mag - (1 << size) + 1, mag)
        lut[base : base + span] = (total << 20) | (run << 16) | (val + 0x8000)
    return lut.tolist()


class _HuffTable:
    """Huffman table with a 16-bit lookup LUT: one table probe decodes
    any symbol (codes are ≤ 16 bits), replacing the bit-at-a-time walk
    that dominated pure-Python decode time.  LUT entry = (length << 8)
    | symbol; 0 marks an invalid prefix.  ``fast_dc``/``fast_ac`` are
    the fused code+magnitude LUTs (see _build_fast_lut), built lazily
    and cached process-wide — real corpora reuse the Annex K tables, so
    the build cost amortizes to zero."""

    __slots__ = ("codes", "lut", "_key", "_fast")

    def __init__(self, counts: list[int], symbols: list[int]):
        self.codes = _build_huffman_decoder(counts, symbols)
        self._key = (bytes(counts), bytes(symbols))
        self._fast: dict[bool, list] = {}
        lut = np.zeros(1 << 16, dtype=np.uint16)
        for (length, code), sym in self.codes.items():
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (length << 8) | sym
        # plain list: Python list indexing beats numpy scalar indexing
        # in this per-symbol hot loop by ~5x
        self.lut = lut.tolist()

    def fast(self, is_dc: bool) -> list[int]:
        f = self._fast.get(is_dc)
        if f is None:
            key = (self._key, is_dc)
            f = _FAST_LUT_CACHE.pop(key, None)
            if f is None:
                while len(_FAST_LUT_CACHE) >= _FAST_LUT_CACHE_MAX:
                    _FAST_LUT_CACHE.pop(next(iter(_FAST_LUT_CACHE)))
                f = _build_fast_lut(self.codes, is_dc)
            # pop+reinsert makes eviction LRU: the hot Annex K tables
            # must not be first out just because they entered first
            _FAST_LUT_CACHE[key] = f
            self._fast[is_dc] = f
        return f


def _build_huffman_encoder(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, bit length)."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman_decoder(counts, symbols).items()
    }


# per-bit window table gate: 16 bytes of table per stream byte, so a
# 4 MB segment costs a 64 MB transient — anything larger decodes via
# the shift path (restart-intervaled streams never get near this)
_W16_MAX_SEGMENT_BYTES = 4_000_000


class _BitReader:
    """MSB-first reader over destuffed entropy segments (one segment
    per restart interval; crossing a boundary resets DC predictors)."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.seg = 0
        self._load(segments[0] if segments else b"")

    def _load(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position within current segment
        self.nbits = len(data) * 8
        # 24-bit window per BYTE offset, built vectorized once per
        # segment: peeking 16 bits is ONE memoryview index + shift
        # (measured ~2.5x faster than the from_bytes slice this
        # replaced).  uint32 array = 4 bytes per stream byte.
        a = np.frombuffer(data + b"\x00\x00\x00", dtype=np.uint8).astype(np.uint32)
        w24 = np.ascontiguousarray((a[:-2] << 16) | (a[1:-1] << 8) | a[2:])
        self.w24 = memoryview(w24)
        # per-BIT 16-bit window table: the hot loops' peek collapses to
        # a single memoryview index, no shift/mask (uint16 × nbits =
        # 16 bytes per stream byte, so gated by segment size; restart
        # intervals keep real segments far below the gate)
        if len(data) <= _W16_MAX_SEGMENT_BYTES:
            # 2048 zero entries of tail padding: the hot loops defer the
            # exhaustion check to the END of each block (saves one
            # compare per coefficient), so a corrupt stream may probe up
            # to one block (≤ 64 coefs × ≤ 31 bits) past nbits before
            # the per-block check raises — the padding keeps those
            # probes in bounds and they read as zero bits
            w16 = np.zeros(8 * len(w24) + 2048, dtype=np.uint16)
            for phase in range(8):
                w16[phase : 8 * len(w24) : 8] = (w24 >> (8 - phase)) & 0xFFFF
            self.w16 = memoryview(w16)
        else:  # pragma: no cover - exercised via a lowered gate in tests
            self.w16 = None

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise JpegError("entropy data exhausted")
        bit = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def _peek16(self) -> int:
        """Next 16 bits, zero-padded past the segment end (consumption
        is bounds-checked separately)."""
        pos = self.pos
        if self.w16 is not None:
            return self.w16[pos]
        return (self.w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise JpegError("entropy data exhausted")
        if n <= 16:
            v = self._peek16() >> (16 - n)
            self.pos += n
            return v
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def next_segment(self) -> None:
        self.seg += 1
        if self.seg >= len(self.segments):
            raise JpegError("missing restart segment")
        self._load(self.segments[self.seg])

    def decode_symbol(self, table: "_HuffTable") -> int:
        # single LUT probe on a 16-bit window (all JPEG codes fit)
        entry = table.lut[self._peek16()]
        if entry == 0:
            raise JpegError("invalid Huffman code")
        length = entry >> 8
        if self.pos + length > self.nbits:
            raise JpegError("entropy data exhausted")
        self.pos += length
        return entry & 0xFF


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map the ``size`` raw magnitude bits to a signed
    coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _destuff(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start``: drop 0xFF00 stuffing, split
    at restart markers, stop at any other marker.  Returns (segments,
    index of the terminating marker's 0xFF).

    Vectorized: one numpy pass finds every 0xFF, classifies the byte
    after it, and the scan end is the first non-stuffing non-RST
    marker; segment bodies then destuff with bytes.replace (C speed).
    The byte-at-a-time walk this replaces cost ~25% of a whole
    640x480 decode."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    ff = np.flatnonzero(arr[start : n - 1] == 0xFF) + start
    if ff.size:
        nxt = arr[ff + 1]
        is_stuff = nxt == 0x00
        is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
        term = np.flatnonzero(~is_stuff & ~is_rst)
        stop = int(ff[term[0]]) if term.size else None
        if stop is None:
            # trailing lone 0xFF (if any) terminates the walk below
            cut_idx = ff.size
        else:
            cut_idx = int(term[0])
        rst_pos = ff[:cut_idx][is_rst[:cut_idx]]
    else:
        stop = None
        rst_pos = ff
    if stop is None:
        stop = n - 1 if n > start and data[n - 1] == 0xFF else n
    bounds = [start, *(int(p) for p in rst_pos), stop]
    segments = [
        data[bounds[i] + (2 if i else 0) : bounds[i + 1]].replace(b"\xff\x00", b"\xff")
        for i in range(len(bounds) - 1)
    ]
    return segments, stop


_MAX_PIXELS = 64_000_000  # corrupted SOF dims must not OOM the executor


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array: 2-D grayscale or H×W×3 BGR.  Handles
    baseline sequential (SOF0/SOF1) and **progressive** (SOF2: spectral
    selection + successive approximation, the common web-JPEG form) by
    accumulating every scan into per-component coefficient planes and
    reconstructing once at EOI.

    Every parse-time failure on untrusted bytes surfaces as
    ``JpegError`` — a corrupted payload must be a decode *failure*, not
    a poison pill that kills the Spark task (fuzz-tested)."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (IndexError, KeyError, ValueError, OverflowError, struct.error) as e:
        raise JpegError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG payload (no SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, [(comp_id, h, v, quant_id)], progressive)
    coeffs: dict[int, np.ndarray] = {}  # cid -> (bh_pad, bw_pad, 64)
    restart_interval = 0
    adobe_transform = None  # APP14: 0 = RGB (no YCbCr transform), 1 = YCbCr
    scans_done = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1] if i + 1 < n else 0
        if marker in (0xFF, 0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 1 if marker == 0xFF else 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise JpegError("truncated marker segment")
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                precision, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if precision == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                if tbl.size != 64:
                    raise JpegError("bad DQT")
                quant[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + total])
                table = _HuffTable(counts, symbols)
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"{precision}-bit precision unsupported")
            height, width = struct.unpack(">HH", seg[1:5])
            if height == 0 or width == 0:
                raise JpegError("zero-dimension frame")
            if height * width > _MAX_PIXELS:
                raise JpegError(f"frame {width}x{height} exceeds the pixel cap")
            ncomp = seg[5]
            # only gray/YCbCr/CMYK(YCCK) frames are reconstructable, so
            # reject other counts BEFORE allocating coefficient planes —
            # a corrupt 255-component SOF would otherwise allocate ~66 GB
            # under the pixel cap (review finding, reproduced)
            if ncomp not in (1, 3, 4):
                raise JpegError(f"{ncomp}-component frame unsupported")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise JpegError(f"sampling factors {h_i}x{v_i} out of spec")
                comps.append((cid, h_i, v_i, seg[8 + 3 * ci]))
            frame = (height, width, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            total_bytes = sum(
                mcus_y * c[2] * mcus_x * c[1] * 64 * 4 for c in comps
            )
            if total_bytes > (1 << 29):  # 512 MB coefficient budget
                raise JpegError("coefficient planes exceed the memory budget")
            coeffs = {
                c[0]: np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int32)
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14 color transform
            adobe_transform = seg[11] if len(seg) > 11 else None
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tsel = seg[2 + 2 * si]
                scan_comps.append((cid, tsel >> 4, tsel & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            segments, end = _destuff(data, i + 2 + seg_len)
            _decode_scan_into(
                frame, coeffs, huff_dc, huff_ac, scan_comps,
                ss, se, ah, al, segments, restart_interval,
            )
            scans_done += 1
            i = end
            continue
        i += 2 + seg_len
    if frame is None or scans_done == 0:
        raise JpegError("no SOS marker found")
    return _reconstruct(frame, quant, coeffs, adobe_transform)


def _comp_block_dims(width, height, h, v, hmax, vmax):
    """Non-interleaved scans walk the COMPONENT's own block grid:
    ceil(ceil(dim * f / fmax) / 8) per axis."""
    bw = -(-(-(-width * h // hmax)) // 8)
    bh = -(-(-(-height * v // vmax)) // 8)
    return bw, bh


def _decode_scan_into(frame, coeffs, huff_dc, huff_ac, scan_comps,
                      ss, se, ah, al, segments, restart_interval):
    """Decode ONE entropy-coded scan into the coefficient planes.
    Baseline: the single full-band scan.  Progressive: DC first/refine
    (interleaved or not), AC first/refine (single component per spec,
    with EOB-run state)."""
    height, width, comps, progressive = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    reader = _BitReader(segments)
    pred = {cid: 0 for cid, _, _ in scan_comps}
    eobrun = [0]

    def dc_table(tid):
        t = huff_dc.get(tid)
        if t is None:
            raise JpegError("scan references undefined DC table")
        return t

    def ac_table(tid):
        t = huff_ac.get(tid)
        if t is None:
            raise JpegError("scan references undefined AC table")
        return t

    def bound_pred(cid):
        # a valid DC value fits comfortably in 2^20 (8-bit samples,
        # quantized); a runaway accumulator means corrupt entropy data
        # and would overflow the int32 coefficient plane
        if not -(1 << 24) < pred[cid] < (1 << 24):
            raise JpegError("DC predictor out of range (corrupt stream)")

    def baseline_block(blk, cid, dc_t, ac_t):
        # hot loop: local bit cursor + fused LUTs, ONE w16 probe per
        # coefficient on the fast path (code+magnitude in one window);
        # slow path (EOB/ZRL/over-long composites) via the plain LUT
        pos = reader.pos
        nbits = reader.nbits
        w16 = reader.w16
        if w16 is None:  # >gate segment: shift-probe variant
            return baseline_block_shift(blk, cid, dc_t, ac_t)
        e = dc_t.fast(True)[w16[pos]]
        if e and pos + (e >> 20) <= nbits:
            pos += e >> 20
            p = pred[cid] = pred[cid] + (e & 0xFFFF) - 0x8000
        else:
            reader.pos = pos
            s = reader.decode_symbol(dc_t)
            pred[cid] += _extend(reader.read_bits(s), s) if s else 0
            pos = reader.pos
            p = pred[cid]
        if not -(1 << 24) < p < (1 << 24):
            raise JpegError("DC predictor out of range (corrupt stream)")
        blk[0] = p
        ac_fast = ac_t.fast(False)
        ac_lut = ac_t.lut
        # direct scalar writes into the block row: measured FASTER than
        # collecting (k, v) lists + one fancy-index scatter (r5 A/B,
        # byte-identical) — the two appends per coefficient cost as much
        # as the setitem difference, and the batch conversion is pure
        # overhead on top
        k = 1
        while k < 64:
            e = ac_fast[w16[pos]]
            if e:
                pos += e >> 20
                k += (e >> 16) & 0x0F
                if k > 63:
                    raise JpegError("AC run past block end")
                blk[k] = (e & 0xFFFF) - 0x8000
                k += 1
                continue
            entry = ac_lut[w16[pos]]
            if entry == 0:
                raise JpegError("invalid Huffman code")
            pos += entry >> 8
            rs = entry & 0xFF
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC run past block end")
            if pos > nbits:
                raise JpegError("entropy data exhausted")
            reader.pos = pos
            blk[k] = _extend(reader.read_bits(s), s)
            pos = reader.pos
            k += 1
        # exhaustion check deferred to block end (w16 tail padding keeps
        # the overrun probes in bounds; see _load)
        if pos > nbits:
            raise JpegError("entropy data exhausted")
        reader.pos = pos

    def baseline_block_shift(blk, cid, dc_t, ac_t):
        # identical semantics over the 24-bit shift probe — only very
        # large (>gate) unsegmented streams land here
        pos = reader.pos
        nbits = reader.nbits
        w24 = reader.w24
        w = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
        e = dc_t.fast(True)[w]
        if e and pos + (e >> 20) <= nbits:
            pos += e >> 20
            p = pred[cid] = pred[cid] + (e & 0xFFFF) - 0x8000
        else:
            reader.pos = pos
            s = reader.decode_symbol(dc_t)
            pred[cid] += _extend(reader.read_bits(s), s) if s else 0
            pos = reader.pos
            p = pred[cid]
        if not -(1 << 24) < p < (1 << 24):
            raise JpegError("DC predictor out of range (corrupt stream)")
        blk[0] = p
        ac_fast = ac_t.fast(False)
        ac_lut = ac_t.lut
        k = 1
        while k < 64:
            w = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
            e = ac_fast[w]
            if e:
                t = e >> 20
                if pos + t > nbits:
                    raise JpegError("entropy data exhausted")
                pos += t
                k += (e >> 16) & 0x0F
                if k > 63:
                    raise JpegError("AC run past block end")
                blk[k] = (e & 0xFFFF) - 0x8000
                k += 1
                continue
            entry = ac_lut[w]
            if entry == 0:
                raise JpegError("invalid Huffman code")
            length = entry >> 8
            if pos + length > nbits:
                raise JpegError("entropy data exhausted")
            pos += length
            rs = entry & 0xFF
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC run past block end")
            reader.pos = pos
            blk[k] = _extend(reader.read_bits(s), s)
            pos = reader.pos
            k += 1
        reader.pos = pos

    def dc_block(blk, cid, dc_t):
        if ah == 0:  # first pass: fused probe (same shape as baseline)
            pos = reader.pos
            w16 = reader.w16
            w = w16[pos] if w16 is not None else (reader.w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
            e = dc_t.fast(True)[w]
            if e and pos + (e >> 20) <= reader.nbits:
                reader.pos = pos + (e >> 20)
                pred[cid] += (e & 0xFFFF) - 0x8000
            else:
                s = reader.decode_symbol(dc_t)
                pred[cid] += _extend(reader.read_bits(s), s) if s else 0
            bound_pred(cid)
            blk[0] = pred[cid] << al
        else:  # refinement: one correction bit
            if reader.read_bit():
                blk[0] |= 1 << al

    def ac_first_block(blk, ac_t):
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        pos = reader.pos
        nbits = reader.nbits
        w16 = reader.w16
        if w16 is None:  # >gate segment: shift-probe variant
            return ac_first_block_shift(blk, ac_t)
        ac_fast = ac_t.fast(False)
        ac_lut = ac_t.lut
        # direct scalar writes (same rationale as baseline_block)
        k = ss
        while k <= se:
            e = ac_fast[w16[pos]]
            if e:
                pos += e >> 20
                k += (e >> 16) & 0x0F
                if k > se:
                    raise JpegError("AC run past band end")
                blk[k] = ((e & 0xFFFF) - 0x8000) << al
                k += 1
                continue
            entry = ac_lut[w16[pos]]
            if entry == 0:
                raise JpegError("invalid Huffman code")
            pos += entry >> 8
            rs = entry & 0xFF
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    if pos > nbits:
                        raise JpegError("entropy data exhausted")
                    reader.pos = pos
                    eobrun[0] = (1 << r) - 1
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    pos = reader.pos
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise JpegError("AC run past band end")
            if pos > nbits:
                raise JpegError("entropy data exhausted")
            reader.pos = pos
            blk[k] = _extend(reader.read_bits(s), s) << al
            pos = reader.pos
            k += 1
        # exhaustion check deferred to block end (w16 tail padding keeps
        # the overrun probes in bounds; see _load)
        if pos > nbits:
            raise JpegError("entropy data exhausted")
        reader.pos = pos

    def ac_first_block_shift(blk, ac_t):
        pos = reader.pos
        nbits = reader.nbits
        w24 = reader.w24
        ac_fast = ac_t.fast(False)
        ac_lut = ac_t.lut
        k = ss
        while k <= se:
            w = (w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
            e = ac_fast[w]
            if e:
                t = e >> 20
                if pos + t > nbits:
                    raise JpegError("entropy data exhausted")
                pos += t
                k += (e >> 16) & 0x0F
                if k > se:
                    raise JpegError("AC run past band end")
                blk[k] = ((e & 0xFFFF) - 0x8000) << al
                k += 1
                continue
            entry = ac_lut[w]
            if entry == 0:
                raise JpegError("invalid Huffman code")
            length = entry >> 8
            if pos + length > nbits:
                raise JpegError("entropy data exhausted")
            pos += length
            rs = entry & 0xFF
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    reader.pos = pos
                    eobrun[0] = (1 << r) - 1
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    pos = reader.pos
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise JpegError("AC run past band end")
            reader.pos = pos
            blk[k] = _extend(reader.read_bits(s), s) << al
            pos = reader.pos
            k += 1
        reader.pos = pos

    def ac_refine_block(blk, ac_t):
        # T.81 G.1.2.3: correction bits for already-nonzero coefficients,
        # newly-significant ±1<<al placed at zero-history positions
        p1, m1 = 1 << al, -(1 << al)

        def refine_existing(k):
            if reader.read_bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] > 0 else m1

        k = ss
        if eobrun[0] == 0:
            while k <= se:
                rs = reader.decode_symbol(ac_t)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        # the current block is the first of the EOB run:
                        # its remaining coefficients still get correction
                        # bits below, then the tail decrement counts it
                        eobrun[0] = (1 << r) + (reader.read_bits(r) if r else 0)
                        break
                    val = 0  # ZRL: pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise JpegError("bad refinement magnitude category")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    if blk[k]:
                        refine_existing(k)
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun[0] > 0:
            while k <= se:
                if blk[k]:
                    refine_existing(k)
                k += 1
            eobrun[0] -= 1

    interleaved = len(scan_comps) > 1
    is_dc_scan = ss == 0

    def reset_state():
        for cid in pred:
            pred[cid] = 0
        eobrun[0] = 0

    if not progressive:
        if interleaved:
            units = mcus_x * mcus_y
            for mcu in range(units):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.next_segment()
                    reset_state()
                my, mx = divmod(mcu, mcus_x)
                for cid, dct, act in scan_comps:
                    _, h, v, _q = by_id[cid]
                    for bv in range(v):
                        for bh in range(h):
                            baseline_block(
                                coeffs[cid][my * v + bv, mx * h + bh], cid,
                                dc_table(dct), ac_table(act),
                            )
        else:
            # a legal sequential scan over ONE component of a multi-
            # component frame walks the component's own block grid in
            # raster order (one block per MCU), not the frame MCU grid
            cid, dct, act = scan_comps[0]
            _, h, v, _q = by_id[cid]
            bw, bh_n = _comp_block_dims(width, height, h, v, hmax, vmax)
            unit = 0
            for by in range(bh_n):
                for bx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.next_segment()
                        reset_state()
                    baseline_block(coeffs[cid][by, bx], cid, dc_table(dct), ac_table(act))
                    unit += 1
        return

    if is_dc_scan:
        if se != 0:
            raise JpegError("progressive DC scan with Se != 0")
        units = mcus_x * mcus_y if interleaved else None
        if interleaved:
            for mcu in range(units):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.next_segment()
                    reset_state()
                my, mx = divmod(mcu, mcus_x)
                for cid, dct, _act in scan_comps:
                    _, h, v, _q = by_id[cid]
                    for bv in range(v):
                        for bh in range(h):
                            dc_block(coeffs[cid][my * v + bv, mx * h + bh], cid,
                                     dc_table(dct))
        else:
            cid, dct, _act = scan_comps[0]
            _, h, v, _q = by_id[cid]
            bw, bh_n = _comp_block_dims(width, height, h, v, hmax, vmax)
            unit = 0
            for by in range(bh_n):
                for bx in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.next_segment()
                        reset_state()
                    dc_block(coeffs[cid][by, bx], cid, dc_table(dct))
                    unit += 1
        return

    # AC scan: single component, non-interleaved (T.81 requirement)
    if interleaved:
        raise JpegError("progressive AC scan must be non-interleaved")
    cid, _dct, act = scan_comps[0]
    _, h, v, _q = by_id[cid]
    bw, bh_n = _comp_block_dims(width, height, h, v, hmax, vmax)
    table = ac_table(act)  # constant for the scan: resolve once, not per block
    unit = 0
    for by in range(bh_n):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.next_segment()
                reset_state()
            blk = coeffs[cid][by, bx]
            if ah == 0:
                ac_first_block(blk, table)
            else:
                ac_refine_block(blk, table)
            unit += 1


def _reconstruct(frame, quant, coeffs, adobe_transform=None):
    height, width, comps, _progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = {}
    for cid, h, v, qid in comps:
        if qid not in quant:
            raise JpegError("frame references undefined quant table")
        # dequant folded into the per-table IDCT matrix: one dgemm
        # turns all zigzag coefficient rows into pixel rows at once
        m_q = quant[qid].astype(np.float64)[:, None] * _IDCT_M
        pixels = coeffs[cid].reshape(-1, 64).astype(np.float64) @ m_q + 128.0
        pixels = np.clip(np.round(pixels), 0, 255).astype(np.uint8)
        bw = mcus_x * h
        bh = mcus_y * v
        plane = (
            pixels.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by replication, crop to H×W
        ry, rx = vmax // v, hmax // h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:height, :width]

    if len(comps) == 1:
        return planes[comps[0][0]]
    if len(comps) == 4:
        # Adobe 4-component: APP14 transform 2 = YCCK (the C,M,Y inks
        # ride a YCbCr transform; K passes through), transform 0 or no
        # marker = straight CMYK.  Adobe writers store INVERTED ink
        # (255 = no ink), so RGB = stored_CMY * stored_K / 255 — the
        # libjpeg/Ghostscript convention; output is BGR like the
        # 3-component path.
        p = [planes[c[0]].astype(np.float64) for c in comps]
        if adobe_transform == 2:
            y, cb, cr = p[0], p[1] - 128.0, p[2] - 128.0
            c = np.clip(np.round(y + 1.402 * cr), 0, 255)
            m = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
            ylw = np.clip(np.round(y + 1.772 * cb), 0, 255)
        else:
            c, m, ylw = p[0], p[1], p[2]
        k = p[3]
        r = c * k / 255.0
        g = m * k / 255.0
        b = ylw * k / 255.0
        return np.clip(np.round(np.dstack([b, g, r])), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise JpegError(f"{len(comps)}-component frame unsupported")
    if adobe_transform == 0:
        # Adobe APP14 transform 0: components are straight R, G, B
        r = planes[comps[0][0]]
        g = planes[comps[1][0]]
        b = planes[comps[2][0]]
        return np.dstack([b, g, r])
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([b, g, r])), 0, 255).astype(np.uint8)


# --- encoder (fixture writer) -----------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scaling formula."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_dc(bw, coefs, pred, dc_enc):
    diff = int(coefs[0]) - pred
    s = abs(diff).bit_length() if diff else 0
    code, length = dc_enc[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return int(coefs[0])


def _encode_ac_band(bw, coefs, ac_enc):
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coefs[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB (run of 1 in progressive terms)
        bw.write(code, length)


def _encode_block(bw, coefs, pred, dc_enc, ac_enc):
    new_pred = _encode_dc(bw, coefs, pred, dc_enc)
    _encode_ac_band(bw, coefs, ac_enc)
    return new_pred


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsample: bool = False,
                restart_interval: int = 0, progressive: bool = False,
                ycck: bool = False) -> bytes:
    """uint8 array (2-D gray, H×W×3 BGR, or H×W×4 Adobe-inverted CMYK)
    → JFIF bytes.  ``subsample=True`` writes 4:2:0 (2×2 chroma), else
    4:4:4.  ``progressive=True`` emits SOF2 with a spectral-selection
    scan script (DC scan, then per-component 1-63 AC bands); restart
    intervals apply to the baseline form only.

    4-channel input is Adobe CMYK with INVERTED ink values (255 = no
    ink, the convention Adobe writers emit); an APP14 marker records the
    transform — ``ycck=True`` routes the C,M,Y channels through the
    YCbCr transform (APP14 transform 2), else they store raw (transform
    0).  Subsampling is 4:4:4-only for 4-component streams."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    cmyk = a.ndim == 3 and a.shape[2] == 4
    if not gray and not cmyk and (a.ndim != 3 or a.shape[2] != 3):
        raise JpegError(f"unsupported array shape {a.shape}")
    # fail loudly on unsupported combinations, like every other shape
    # error here — silently ignoring a flag would let a fixture believe
    # it exercised a path it never produced (review r5)
    if ycck and not cmyk:
        raise JpegError("ycck=True requires 4-channel CMYK input")
    if cmyk and subsample:
        raise JpegError("subsampling is 4:4:4-only for 4-component streams")
    height, width = a.shape[0], a.shape[1]
    if height == 0 or width == 0:
        raise JpegError("zero-dimension image")

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    adobe_transform = None
    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    elif cmyk:
        c = a[:, :, 0].astype(np.float64)
        m = a[:, :, 1].astype(np.float64)
        ylw = a[:, :, 2].astype(np.float64)
        k = a[:, :, 3].astype(np.float64)
        if ycck:
            y = 0.299 * c + 0.587 * m + 0.114 * ylw
            cb = -0.168736 * c - 0.331264 * m + 0.5 * ylw + 128.0
            cr = 0.5 * c - 0.418688 * m - 0.081312 * ylw + 128.0
            planes = [y - 128.0, cb - 128.0, cr - 128.0, k - 128.0]
            qsel = [0, 1, 1, 0]
            adobe_transform = 2
        else:
            planes = [c - 128.0, m - 128.0, ylw - 128.0, k - 128.0]
            qsel = [0, 0, 0, 0]
            adobe_transform = 0
        samp = [(1, 1)] * 4
    else:
        b, g, r = a[:, :, 0].astype(np.float64), a[:, :, 1].astype(np.float64), a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2×2 box average, matching the replication upsample shape
            def down(p):
                hh, ww = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                q = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0

            planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per-plane: pad to the MCU grid and FDCT+quantize all blocks at once
    qtabs = [ql, qc]
    comp_blocks = []
    for (h, v), plane, qid in zip(samp, planes, qsel):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        p = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
        )
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        f = np.einsum("ij,njk,kl->nil", _T, blocks, _T.T).reshape(-1, 64)
        zz = f[:, ZIGZAG]
        q = np.round(zz / qtabs[qid][None, :]).astype(np.int32)
        comp_blocks.append(q.reshape(ph // 8, pw // 8, 64))

    dc_luma_enc = _build_huffman_encoder(DC_LUMA_COUNTS, DC_LUMA_SYMBOLS)
    ac_luma_enc = _build_huffman_encoder(AC_LUMA_COUNTS, AC_LUMA_SYMBOLS)
    dc_chroma_enc = _build_huffman_encoder(DC_CHROMA_COUNTS, DC_CHROMA_SYMBOLS)
    ac_chroma_enc = _build_huffman_encoder(AC_CHROMA_COUNTS, AC_CHROMA_SYMBOLS)
    # table selection follows the quant selection: luma tables for the
    # achromatic planes (Y / C,M,Y,K raw / K), chroma for Cb/Cr
    encs = [
        (dc_luma_enc, ac_luma_enc) if q == 0 else (dc_chroma_enc, ac_chroma_enc)
        for q in qsel
    ]

    ncomp = len(samp)
    scans: list[tuple[bytes, bytes]] = []  # (SOS body, entropy bytes)

    def sos_body(comp_sel: list[int], ss: int, se: int) -> bytes:
        body = bytes([len(comp_sel)])
        for ci in comp_sel:
            body += bytes([ci + 1, 0x00 if qsel[ci] == 0 else 0x11])
        return body + bytes([ss, se, 0])

    if progressive:
        # scan script: one interleaved DC scan, then Ss=1..63 AC bands
        # per component (T.81 requires AC scans be single-component);
        # Ah=Al=0 spectral selection — a legal progressive stream that
        # exercises the decoder's multi-scan accumulation and EOB runs
        bw = _BitWriter()
        preds = [0] * ncomp
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, ((h, v), (dc_enc, _ac)) in enumerate(zip(samp, encs)):
                for bv in range(v):
                    for bh_ in range(h):
                        blk = comp_blocks[ci][my * v + bv, mx * h + bh_]
                        preds[ci] = _encode_dc(bw, blk, preds[ci], dc_enc)
        bw.flush()
        scans.append((sos_body(list(range(ncomp)), 0, 0), bytes(bw.out)))
        for ci, ((h, v), (_dc, ac_enc)) in enumerate(zip(samp, encs)):
            comp_w = -(-width * h // hmax)
            comp_h = -(-height * v // vmax)
            bw_n, bh_n = -(-comp_w // 8), -(-comp_h // 8)
            bw = _BitWriter()
            for by in range(bh_n):
                for bx in range(bw_n):
                    _encode_ac_band(bw, comp_blocks[ci][by, bx], ac_enc)
            bw.flush()
            scans.append((sos_body([ci], 1, 63), bytes(bw.out)))
    else:
        entropy = bytearray()
        bw = _BitWriter()
        preds = [0] * ncomp
        rst = 0
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                preds = [0] * ncomp
            my, mx = divmod(mcu, mcus_x)
            for ci, ((h, v), (dc_enc, ac_enc)) in enumerate(zip(samp, encs)):
                for bv in range(v):
                    for bh_ in range(h):
                        blk = comp_blocks[ci][my * v + bv, mx * h + bh_]
                        preds[ci] = _encode_block(bw, blk, preds[ci], dc_enc, ac_enc)
        bw.flush()
        entropy += bw.out
        scans.append((sos_body(list(range(ncomp)), 0, 63), bytes(entropy)))

    # --- assemble the stream ------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    if not cmyk:
        # JFIF APP0 is defined for 1/3-component Y'CbCr only; Adobe
        # 4-component files carry APP14 INSTEAD of APP0 (review r5 —
        # a JFIF+4-component combination is one no real writer emits)
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tbl):
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(int(x) for x in tbl)

    out += dqt(0, ql)
    if any(q == 1 for q in qsel):
        out += dqt(1, qc)

    if adobe_transform is not None:
        # APP14 'Adobe' v100, flags 0, transform byte last
        out += (
            b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
            + bytes([0, 100, 0, 0, 0, 0, adobe_transform])
        )

    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        h, v = samp[ci]
        sof += bytes([ci + 1, (h << 4) | v, qsel[ci]])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, counts, symbols):
        body = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_COUNTS, DC_LUMA_SYMBOLS)
    out += dht(1, 0, AC_LUMA_COUNTS, AC_LUMA_SYMBOLS)
    if any(q == 1 for q in qsel):
        out += dht(0, 1, DC_CHROMA_COUNTS, DC_CHROMA_SYMBOLS)
        out += dht(1, 1, AC_CHROMA_COUNTS, AC_CHROMA_SYMBOLS)

    if restart_interval and not progressive:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for body, entropy_bytes in scans:
        out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body
        out += entropy_bytes
    out += b"\xff\xd9"  # EOI
    return bytes(out)
