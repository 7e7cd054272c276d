"""Template-driven extraction (reference E3: /extract_pdf_details_byurl,
app.py:4017-4133).

The reference fetches a bbox template per document id from an external
service (app.py:3975-4014), clips each (page, field) rect out of the
PDF, fuzzy-matches against the requested field values, and folds a
running average (J4, app.py:3901-3967).

Spark shape: templates are a small dim table → ``broadcast`` join; the
clip text comes from the layout branch (token table → bbox clip — here
the pre-clipped ``clips`` table stands in for the PDF reader, same
schema either way); the fold is within-document (no shuffle) in an
Arrow UDF calling the shared ``template_fold`` kernel.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ocr_api_spark.kernels.matching import template_fold

FOLD_SCHEMA = StructType(
    [
        StructField("ocrdata", MapType(StringType(), StringType()), True),
        StructField("matching_results", MapType(StringType(), DoubleType()), True),
        StructField("average_match_percentage", DoubleType(), True),
    ]
)


@pandas_udf(FOLD_SCHEMA)
def template_fold_udf(clips_json: pd.Series, felds_json: pd.Series) -> pd.DataFrame:
    """clips_json: ordered [(field, clip_text), ...]; felds_json: the
    requested field→claimed-value map.  Average is float division by the
    number of requested fields (reference quirk, app.py:3967)."""
    rows = []
    for cj, fj in zip(clips_json, felds_json):
        if cj is None or fj is None:
            rows.append({"ocrdata": None, "matching_results": None, "average_match_percentage": None})
            continue
        clips = [(c[0], c[1]) for c in json.loads(cj)]
        felds = json.loads(fj)
        ocrdata, matching_results, average = template_fold(clips, felds)
        rows.append(
            {
                "ocrdata": {k: (v if v is None else str(v)) for k, v in ocrdata.items()},
                "matching_results": {k: float(v) for k, v in matching_results.items()},
                "average_match_percentage": float(average),
            }
        )
    return pd.DataFrame(rows, columns=["ocrdata", "matching_results", "average_match_percentage"])


def pdf_clips(pdfs: DataFrame, templates: DataFrame) -> DataFrame:
    """Real S5: clip each template rect out of actual PDF bytes.

    pdfs(document_id, pdf binary) ⋈ broadcast templates(document_id,
    page, field, x, y, width, height) → (document_id, page, field,
    clip_text), the same schema the pre-clipped ``clips`` table uses —
    ``template_extraction`` consumes either.

    Shape for scale: the template rects are AGGREGATED per document
    first (small dim → collect_list → broadcast), so the 1:1 join
    carries ONE copy of each PDF binary and the UDF parses each PDF
    once, emitting all field clips as an array that explodes JVM-side
    — never N_fields copies of the payload through a shuffle.  The
    clip itself is the E3 bbox with the reference's exact padding +
    retry (app.py:3926-3941 via ``sources.pdftext.clip_text``)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    clip_struct = ArrayType(
        StructType(
            [
                StructField("page", IntegerType()),
                StructField("field", StringType()),
                StructField("clip_text", StringType()),
            ]
        )
    )

    @pandas_udf(clip_struct)
    def clip_all(pdf_bytes: pd.Series, rects: pd.Series) -> pd.Series:
        from ocr_api_spark.sources.pdftext import MiniPdfError, clip_text, parse_pdf

        out = []
        for raw, rect_list in zip(pdf_bytes, rects):
            try:
                pages = parse_pdf(bytes(raw)) if raw is not None else []
            except MiniPdfError:
                pages = []
            clips = []
            if rect_list is None:
                rect_list = []
            for r in rect_list:
                page_no = int(r["page"])
                text = None
                if 1 <= page_no <= len(pages):
                    # reference indexes pdf.pages[int(page)-1] (app.py:3926)
                    text = clip_text(
                        pages[page_no - 1], float(r["x"]), float(r["y"]), float(r["width"]), float(r["height"])
                    )
                clips.append({"page": page_no, "field": r["field"], "clip_text": text})
            out.append(clips)
        return pd.Series(out)

    rects_per_doc = templates.groupBy("document_id").agg(
        F.collect_list(F.struct("page", "field", "x", "y", "width", "height")).alias("rects")
    )
    joined = pdfs.join(F.broadcast(rects_per_doc), "document_id")
    return (
        joined.select("document_id", F.explode(clip_all("pdf", "rects")).alias("c"))
        .select("document_id", F.col("c.page").alias("page"), F.col("c.field").alias("field"), F.col("c.clip_text").alias("clip_text"))
    )


def template_extraction(docs: DataFrame, templates: DataFrame, clips: DataFrame) -> DataFrame:
    """docs(document_id, felds_json) × broadcast templates(document_id,
    page, field, x, y, width, height) × clips(document_id, page, field,
    clip_text) → per-document fold.

    The (page, field) visit order is the template's, so clips are
    re-assembled per document sorted by (page, field) — matching the
    reference's dict-iteration order over ``document_template.items()``
    (JSON object order = page order, fields within a page)."""
    joined = (
        F.broadcast(templates)
        .join(clips, ["document_id", "page", "field"], "left")
        .withColumn("clip_text", F.coalesce(F.col("clip_text"), F.lit("")))
    )
    ordered = (
        joined.groupBy("document_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page", "field", "clip_text"))
                    ),
                    lambda s: F.array(s["field"], s["clip_text"]),
                )
            ).alias("clips_json")
        )
    )
    return (
        docs.join(ordered, "document_id", "left")
        .withColumn("fold", template_fold_udf(F.col("clips_json"), F.col("felds_json")))
        .select(
            "document_id",
            F.col("fold.ocrdata").alias("ocrdata"),
            F.col("fold.matching_results").alias("matching_results"),
            F.col("fold.average_match_percentage").alias("average_match_percentage"),
        )
    )
