"""Span-annotation operator (reference get_index, app.py:1886-1925;
SURVEY.md J7/F45): all literal occurrences of each labelled value in
the extracted text → ``array<struct<start:int, end:int, label:string>>``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from ocr_api_spark.kernels.spans import span_records

SPAN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("label", StringType()),
        ]
    )
)


def with_spans(df: DataFrame, text_col: str, labelled_cols: dict[str, str]) -> DataFrame:
    """``labelled_cols`` maps label → column holding the value to locate.
    One Arrow batch pass; kernel shared with the pytest oracle."""
    labels = list(labelled_cols.keys())
    value_cols = [F.col(c) for c in labelled_cols.values()]

    @pandas_udf(SPAN_SCHEMA)
    def spans_udf(texts: pd.Series, *values: pd.Series) -> pd.Series:
        out = []
        for i in range(len(texts)):
            text = texts.iloc[i]
            if text is None:
                out.append([])
                continue
            pairs = [(lab, values[j].iloc[i] or "") for j, lab in enumerate(labels)]
            out.append(span_records(text, pairs))
        return pd.Series(out)

    return df.withColumn("spans", spans_udf(F.col(text_col), *value_cols))
