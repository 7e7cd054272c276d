"""Multimodal payload operators (image/PDF branch plumbing).

The reference's image ops (SURVEY.md §2.6 I1-I13) need OpenCV /
pdf2image / OCR engines that are not in this container, so the *decode*
step is stubbed behind import gates — but the Spark-side plumbing is
real: binary payload columns with typed metadata, Arrow-batched
``mapInPandas`` with a per-executor singleton decoder, deterministic
fake features for tests, and the token-table masking path (which is
pure geometry and fully implemented via the kernel).

Schema contract for opaque payloads:
    payload: binary, payload_kind: string ('image'|'pdf'|'audio'|...),
    meta: struct<width:int, height:int, mime:string>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ocr_api_spark.kernels.masking import mask_aadhaar_regions, order_tokens_reading, tokens_to_text

FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("payload_kind", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_status", StringType(), True),
    ]
)


class _Decoder:
    """Per-executor singleton (the reference reconstructs its OCR model
    per request, app.py:2163 — this is the fix).  Real decoders (cv2,
    pdfium) plug in here; the container lacks them, so decode() yields a
    deterministic fake feature derived from the payload bytes."""

    _instance = None

    @classmethod
    def get(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def __init__(self) -> None:
        try:  # pragma: no cover - not present in this container
            import cv2  # noqa: F401

            self.backend = "cv2"
        except ImportError:
            self.backend = "fake"

    def decode(self, payload: bytes) -> tuple[list[float], str]:
        if payload is None:
            return [], "empty"
        if self.backend == "cv2":  # pragma: no cover
            raise NotImplementedError("real image decode wired when cv2 is available")
        # deterministic 8-dim fake feature: md5 bytes scaled to [0, 1)
        digest = hashlib.md5(payload).digest()
        return [b / 255.0 for b in digest[:8]], "fake"


def image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads — the
    batch shape, schema, and singleton pattern are the production path;
    only the decode math is a stand-in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _Decoder.get()
        for pdf in batches:
            feats, statuses, sizes = [], [], []
            for payload in pdf[payload_col]:
                f, s = dec.decode(payload)
                feats.append(f)
                statuses.append(s)
                sizes.append(len(payload) if payload is not None else 0)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "payload_kind": pdf.get("payload_kind", pd.Series(["image"] * len(pdf))),
                    "n_bytes": sizes,
                    "feature": feats,
                    "decode_status": statuses,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


SIGNATURE_SCHEMA = StructType(
    [
        StructField("is_background_white", StringType()),
        StructField("is_horizontal", StringType()),
        StructField("needs_rotation", StringType()),
        StructField("is_straight_line", StringType()),
    ]
)


def with_signature_verdicts(df: DataFrame, img_col: str = "img") -> DataFrame:
    """Signature-format classification (reference /api/verify-signature-
    format, app.py:4895+; kernels I7-I10) over a typed grayscale image
    column ``array<array<int>>``.  The binary→array decode lives behind
    the multimodal ``_Decoder`` gate; this operator takes decoded arrays
    so the geometry path is fully real and hermetically testable."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    from ocr_api_spark.kernels.signature import classify_signature

    @pandas_udf(SIGNATURE_SCHEMA)
    def sig_udf(imgs: pd.Series) -> pd.DataFrame:
        rows = []
        for img in imgs:
            if img is None:
                rows.append({k.name: None for k in SIGNATURE_SCHEMA.fields})
                continue
            arr = np.array([list(r) for r in img], dtype=np.uint8)
            verdict = classify_signature(arr)
            rows.append({k: str(v) for k, v in verdict.items()})
        return pd.DataFrame(rows, columns=[f.name for f in SIGNATURE_SCHEMA.fields])

    return df.withColumn("signature", sig_udf(F.col(img_col)))


TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("text", StringType()),
            StructField("conf", FloatType()),
            StructField("box", ArrayType(ArrayType(IntegerType()))),
        ]
    )
)

MASK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("x_min", IntegerType()),
            StructField("y_min", IntegerType()),
            StructField("x_max", IntegerType()),
            StructField("y_max", IntegerType()),
        ]
    )
)


def with_mask_regions(df: DataFrame, tokens_col: str = "tokens", h_col: str = "img_h", w_col: str = "img_w") -> DataFrame:
    """Aadhaar-mask rectangles from the OCR token table (kernel I11) —
    pure geometry, fully real."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(MASK_SCHEMA)
    def mask_udf(tokens: pd.Series, hs: pd.Series, ws: pd.Series) -> pd.Series:
        out = []
        for toks, h, w in zip(tokens, hs, ws):
            if toks is None:
                out.append([])
                continue
            triples = [(t["text"], t["conf"], t["box"]) for t in toks]
            out.append(mask_aadhaar_regions(triples, int(h), int(w)))
        return pd.Series(out)

    return df.withColumn("mask_regions", mask_udf(F.col(tokens_col), F.col(h_col), F.col(w_col)))


def with_token_text(df: DataFrame, tokens_col: str = "tokens", conf_threshold: float = 0.0) -> DataFrame:
    """Reading-order sort + confidence-thresholded merge → the OCR-text
    IR (kernel I13/S7 analog)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(StringType())
    def text_udf(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            if toks is None:
                out.append(None)
                continue
            triples = [(t["text"], t["conf"], t["box"]) for t in toks]
            out.append(tokens_to_text(order_tokens_reading(triples), conf_threshold))
        return pd.Series(out)

    return df.withColumn("token_text", text_udf(F.col(tokens_col)))
