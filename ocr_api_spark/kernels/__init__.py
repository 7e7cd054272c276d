"""Pure-Python extraction kernels (zero Spark imports).

Each kernel is a line-faithful port of a function in the reference
``app.py`` (cited per function).  The reference defines some helpers
twice; Python binds at call time, so the *later* definition is the one
every runtime call sees — these modules pin the effective versions
(see ``common``).  Kernels deliberately reproduce the reference's
quirks (swallowed exceptions, first-line address duplication, ordered
elif chains) because the verification target is byte-identical output.
"""

from ocr_api_spark.kernels import (  # noqa: F401
    aadhaar,
    bank,
    boilerplate,
    common,
    dl,
    image,
    masking,
    matching,
    ocr_adapters,
    pan,
    passport,
    signature,
    spans,
)
